class InvalidDataDirectory(Exception):
    """Error raised when the chosen input directory for the dataset is not
    readable or doesn't exist."""
