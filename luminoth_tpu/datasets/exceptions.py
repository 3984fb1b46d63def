"""Dataset pipeline exceptions."""


class InvalidDataDirectory(Exception):
    """Raised when a dataset input directory is missing or unreadable
    (reference: luminoth/datasets/exceptions.py)."""
