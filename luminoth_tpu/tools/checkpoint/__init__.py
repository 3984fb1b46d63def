"""Checkpoint zoo: local index, bundles, remote download, full CLI.

reference: luminoth/tools/checkpoint/__init__.py (db read/save :45-61,
merge :64-127, alias/id resolution :130-167, config resolution :170-217,
create :414-524, edit :527-551, delete :554-589, export/import :592-683,
refresh :686-688, download :691-713, list/info :337-411, CLI group
:716-729).

Bundles live under ``~/.luminoth_tpu/checkpoints/<id>/`` and hold:
``config.yml`` (with ``train.job_dir`` pointing at the bundle),
``classes.json``, and the weight checkpoint (``ckpt_step_*.msgpack`` with
optimizer state stripped — the reference also drops optimizer slots,
train.py:93-112).
"""

import json
import os
import shutil
import tarfile
import tempfile
import uuid

import click

from luminoth_tpu.utils.config import (
    Config,
    dump_config,
    get_config,
    load_config_files,
)
from luminoth_tpu.utils.homedir import get_home

CHECKPOINT_INDEX = "checkpoints.json"
CHECKPOINT_PATH = "checkpoints"

# Remote zoo index URL. No hosted default: the reference's hosted
# checkpoints (reference: luminoth/tools/checkpoint/__init__.py:21-24)
# are TF-format and not loadable here; point LUMI_REMOTE_INDEX_URL at an
# index of native bundles — produced by `lumi checkpoint create` +
# `export` + `build-index` (any http(s):// or file:// URL works, so a
# shared filesystem or bucket mount can host a zoo with zero servers).
REMOTE_INDEX_URL = ""


def get_remote_index_url():
    """Resolve the remote index URL at call time (env wins)."""
    return os.environ.get("LUMI_REMOTE_INDEX_URL") or REMOTE_INDEX_URL


def get_checkpoints_directory():
    path = os.path.join(get_home(), CHECKPOINT_PATH)
    os.makedirs(path, exist_ok=True)
    return path


def get_checkpoint_path(checkpoint_id):
    return os.path.join(get_checkpoints_directory(), checkpoint_id)


def read_checkpoint_db():
    path = os.path.join(get_checkpoints_directory(), CHECKPOINT_INDEX)
    if not os.path.exists(path):
        return {"checkpoints": []}
    with open(path) as f:
        return json.load(f)


def save_checkpoint_db(db):
    path = os.path.join(get_checkpoints_directory(), CHECKPOINT_INDEX)
    with open(path, "w") as f:
        json.dump(db, f, indent=2)


def get_checkpoint(db, id_or_alias):
    """Resolve by id prefix or alias; local entries win over remote."""
    matches = [
        c for c in db["checkpoints"]
        if c["id"] == id_or_alias or c.get("alias") == id_or_alias
    ]
    if not matches:
        matches = [
            c for c in db["checkpoints"]
            if c["id"].startswith(id_or_alias)
        ]
    if not matches:
        return None
    local = [c for c in matches if c.get("source") == "local"]
    return (local or matches)[0]


def merge_into_db(db, entry):
    existing = [
        i for i, c in enumerate(db["checkpoints"]) if c["id"] == entry["id"]
    ]
    if existing:
        db["checkpoints"][existing[0]] = entry
    else:
        db["checkpoints"].append(entry)
    return db


# ------------------------------------------------------------ remote index


def fetch_remote_index():
    """Fetch the remote checkpoint index (requires network)."""
    import urllib.request

    url = get_remote_index_url()
    if not url:
        raise RuntimeError(
            "No remote index configured; set LUMI_REMOTE_INDEX_URL."
        )
    with urllib.request.urlopen(url, timeout=30) as resp:
        remote = json.load(resp)
    db = read_checkpoint_db()
    # Drop stale remote entries, merge fresh ones.
    db["checkpoints"] = [
        c for c in db["checkpoints"] if c.get("source") != "remote"
        or c.get("status") == "DOWNLOADED"
    ]
    for entry in remote.get("checkpoints", []):
        entry = dict(entry)
        entry.setdefault("source", "remote")
        entry.setdefault("status", "NOT_DOWNLOADED")
        if get_checkpoint(db, entry["id"]) is None:
            db["checkpoints"].append(entry)
    save_checkpoint_db(db)
    return db


def safe_extractall(tar, dest):
    """``extractall`` with the "data" safety filter where available.

    The ``filter=`` kwarg only exists from Python 3.10.12 / 3.11.4;
    older patch releases fall back to a manual member-path check.
    """
    try:
        tar.extractall(dest, filter="data")
    except TypeError:
        _extractall_checked(tar, dest)


def _extractall_checked(tar, dest):
    """Manual stand-in for the "data" filter on old Pythons."""
    base = os.path.realpath(dest)
    for member in tar.getmembers():
        # Links can alias paths that realpath cannot resolve until
        # after extraction (symlink first, then a member routed
        # through it) — the "data" filter rejects them, so must we.
        if member.issym() or member.islnk():
            raise RuntimeError(
                f"tar member is a link (rejected): {member.name}"
            )
        target = os.path.realpath(os.path.join(dest, member.name))
        if target != base and not target.startswith(base + os.sep):
            raise RuntimeError(
                f"tar member escapes destination: {member.name}"
            )
    tar.extractall(dest)


def download_remote_checkpoint(db, entry):
    """Download and unpack a remote checkpoint tarball."""
    import urllib.request

    url = entry["url"]
    target = get_checkpoint_path(entry["id"])
    os.makedirs(target, exist_ok=True)
    tar_path = os.path.join(target, "checkpoint.tar")
    with urllib.request.urlopen(url, timeout=120) as resp:
        with open(tar_path, "wb") as f:
            shutil.copyfileobj(resp, f)
    with tarfile.open(tar_path) as tar:
        names = [n for n in tar.getnames() if n != "checkpoint.tar"]
        rooted = bool(names) and all(
            n == entry["id"] or n.startswith(entry["id"] + "/")
            for n in names
        )
        # export() bundles members under an <id>/ root; extract those
        # into the checkpoints parent so the bundle lands at
        # checkpoints/<id>/ instead of double-nesting. Flat tars
        # (config.yml at the root) extract straight into the target.
        safe_extractall(
            tar, os.path.dirname(target) if rooted else target
        )
    os.remove(tar_path)
    entry["status"] = "DOWNLOADED"
    merge_into_db(db, entry)
    save_checkpoint_db(db)


# ------------------------------------------------------- config resolution


def get_checkpoint_config(id_or_alias, prompt=True):
    """Resolve a checkpoint reference to a ready-to-use config."""
    db = read_checkpoint_db()
    entry = get_checkpoint(db, id_or_alias)
    if entry is None and prompt:
        # Try refreshing the remote index once.
        try:
            db = fetch_remote_index()
            entry = get_checkpoint(db, id_or_alias)
        except Exception:
            pass
    if entry is None:
        raise ValueError(
            "Checkpoint '{}' not found in index.".format(id_or_alias)
        )
    if entry.get("status", "LOCAL") == "NOT_DOWNLOADED":
        if not prompt:
            raise ValueError(
                "Checkpoint '{}' not downloaded.".format(id_or_alias)
            )
        click.echo("Checkpoint not present locally. Downloading...")
        download_remote_checkpoint(db, entry)

    path = get_checkpoint_path(entry["id"])
    config = load_config_files([os.path.join(path, "config.yml")])
    config.train.job_dir = path
    config.train.run_name = None
    from luminoth_tpu.models import get_model
    from luminoth_tpu.utils.config import get_base_config, get_model_config

    base_config = get_base_config(get_model(config.model.type))
    return get_model_config(base_config, config, None)


def get_checkpoint_class_labels(id_or_alias):
    db = read_checkpoint_db()
    entry = get_checkpoint(db, id_or_alias)
    if entry is None:
        return None
    path = os.path.join(
        get_checkpoint_path(entry["id"]), "classes.json"
    )
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


# ------------------------------------------------------------ CLI commands


@click.group(help="Groups of commands to manage checkpoints")
def checkpoint():
    pass


@checkpoint.command(help="List available checkpoints.")
def list():  # noqa: A001 - mirrors reference command name
    db = read_checkpoint_db()
    template = "| {:>12} | {:>6} | {:>14} | {:>8} | {:>14} |"
    click.echo(template.format("id", "name", "alias", "source", "status"))
    click.echo("|" + "-" * 68 + "|")
    for c in db["checkpoints"]:
        click.echo(
            template.format(
                c["id"],
                c.get("name", ""),
                c.get("alias", ""),
                c.get("source", "local"),
                c.get("status", "LOCAL"),
            )
        )


@checkpoint.command(help="Display detailed information on checkpoint.")
@click.argument("id_or_alias")
def info(id_or_alias):
    db = read_checkpoint_db()
    entry = get_checkpoint(db, id_or_alias)
    if entry is None:
        click.echo("Checkpoint not found.")
        return
    click.echo(json.dumps(entry, indent=2))


_EDITABLE_FIELDS = (
    "name", "description", "alias", "dataset.name", "dataset.num_classes",
)


def parse_entries(entries):
    """``-e field=value`` metadata entries → dict (None on bad input).

    Same surface as the reference CLI (tools/checkpoint/__init__.py:
    220-245): a whitelisted, possibly-dotted field per entry, each field
    at most once.
    """
    values = []
    for entry in entries:
        field, sep, value = entry.partition("=")
        if not sep:
            click.echo(f"Invalid entry {entry!r}; expected field=value.")
            return None
        values.append((field, value))
    disallowed = [k for k, _ in values if k not in _EDITABLE_FIELDS]
    if disallowed:
        click.echo(
            "The following fields may not be set: "
            + ", ".join(disallowed)
        )
        return None
    if len(values) != len({k for k, _ in values}):
        click.echo("Repeated fields. Each field may be passed exactly once.")
        return None
    return dict(values)


def apply_entries(entry, parsed):
    """Write (possibly dotted) metadata fields into a checkpoint entry."""
    for field, value in parsed.items():
        target = entry
        *parents, leaf = field.split(".")
        for part in parents:
            target = target.setdefault(part, {})
        target[leaf] = value


@checkpoint.command(help="Create a checkpoint from a configuration file.")
@click.argument("config_args", nargs=-1)
@click.option(
    "config_files", "--config", "-c", multiple=True,
    help="Config to use (same as the positional arguments).")
@click.option(
    "override_params", "--override", "-o", multiple=True)
@click.option("--entity", help="Entity that created the checkpoint.")
@click.option("--alias", help="Alias for the new checkpoint.")
@click.option(
    "entries", "--entry", "-e", multiple=True,
    help="Specify checkpoint's metadata field value (field=value).")
def create(config_args, config_files, override_params, entity, alias,
           entries):
    # The reference takes configs positionally (tools/checkpoint:415);
    # the -c form stays supported alongside. NB: builtin ``list`` is
    # shadowed by the click command above.
    config_files = [*config_args, *config_files]
    if not config_files:
        click.echo("No config file given.")
        return
    parsed_entries = parse_entries(entries)
    if parsed_entries is None:
        return
    from luminoth_tpu.utils.checkpoint_io import CheckpointManager
    from flax import serialization

    config = get_config(
        [c for c in config_files],
        override_params=[o for o in override_params],
    )
    job_dir = config.train.get("job_dir", "jobs/")
    run_name = config.train.get("run_name") or "default"
    source_dir = os.path.join(job_dir, run_name, "ckpt")
    manager = CheckpointManager(source_dir)
    step = manager.latest_step()
    if step is None:
        click.echo(f"No checkpoint found under {source_dir}.")
        return

    checkpoint_id = str(uuid.uuid4()).replace("-", "")[:12]
    target = get_checkpoint_path(checkpoint_id)
    os.makedirs(target, exist_ok=True)

    # Strip optimizer state from the bundled weights.
    with open(manager._path(step), "rb") as f:
        state = serialization.msgpack_restore(f.read())
    slim_state = {
        "step": state.get("step", step),
        "params": state["params"],
        "batch_stats": state.get("batch_stats", {}),
    }
    with open(
        os.path.join(target, f"ckpt_step_{step}.msgpack"), "wb"
    ) as f:
        f.write(serialization.msgpack_serialize(slim_state))
    with open(os.path.join(target, "checkpoint"), "w") as f:
        json.dump({"latest_step": step}, f)

    # Bundle config with job_dir pointing at the bundle itself.
    bundle_config = Config(config)
    bundle_config.train.job_dir = target
    bundle_config.train.run_name = None
    with open(os.path.join(target, "config.yml"), "w") as f:
        f.write(dump_config(bundle_config))

    # classes.json from the dataset dir, if available.
    classes_path = os.path.join(config.dataset.dir, "classes.json")
    if os.path.exists(classes_path):
        shutil.copy(classes_path, os.path.join(target, "classes.json"))

    db = read_checkpoint_db()
    entry = {
        "id": checkpoint_id,
        "name": run_name,
        "description": "",
        "alias": alias or "",
        "model": config.model.type,
        "dataset": {"name": config.dataset.get("dir", "")},
        "entity": entity or "",
        "source": "local",
        "status": "LOCAL",
    }
    apply_entries(entry, parsed_entries)
    merge_into_db(db, entry)
    save_checkpoint_db(db)
    click.echo(f"Checkpoint {checkpoint_id} created successfully.")


@checkpoint.command(help="Edits the checkpoint's metadata.")
@click.argument("id_or_alias")
@click.option("--alias")
@click.option("--name")
@click.option("--description")
@click.option(
    "entries", "--entry", "-e", multiple=True,
    help="Specify checkpoint's metadata field value (field=value).")
def edit(id_or_alias, alias, name, description, entries):
    parsed_entries = parse_entries(entries)
    if parsed_entries is None:
        return
    db = read_checkpoint_db()
    entry = get_checkpoint(db, id_or_alias)
    if entry is None:
        click.echo("Checkpoint not found.")
        return
    if alias is not None:
        entry["alias"] = alias
    if name is not None:
        entry["name"] = name
    if description is not None:
        entry["description"] = description
    apply_entries(entry, parsed_entries)
    merge_into_db(db, entry)
    save_checkpoint_db(db)
    click.echo("Checkpoint updated.")


@checkpoint.command(help="Removes a checkpoint from the index and disk.")
@click.argument("id_or_alias")
def delete(id_or_alias):
    db = read_checkpoint_db()
    entry = get_checkpoint(db, id_or_alias)
    if entry is None:
        click.echo("Checkpoint not found.")
        return
    db["checkpoints"] = [
        c for c in db["checkpoints"] if c["id"] != entry["id"]
    ]
    save_checkpoint_db(db)
    path = get_checkpoint_path(entry["id"])
    if os.path.isdir(path):
        shutil.rmtree(path)
    click.echo(f"Checkpoint {entry['id']} deleted successfully.")


@checkpoint.command(help="Exports a checkpoint to a tar file.")
@click.argument("id_or_alias")
@click.option("--output", default=".", help="Output directory.")
def export(id_or_alias, output):
    db = read_checkpoint_db()
    entry = get_checkpoint(db, id_or_alias)
    if entry is None:
        click.echo("Checkpoint not found.")
        return
    path = get_checkpoint_path(entry["id"])
    tar_path = os.path.join(output, f"{entry['id']}.tar")
    with tarfile.open(tar_path, "w") as tar:
        # Exclude a top-level metadata.json a pre-fix export left
        # inside the live bundle: the fresh one below is the
        # authoritative copy, and tar members with duplicate paths
        # extract order-dependently. Only the bundle-root copy is
        # excluded — nested files named metadata.json are user data.
        stale = f"{entry['id']}/metadata.json"
        tar.add(path, arcname=entry["id"], filter=lambda ti: (
            None if ti.name == stale else ti
        ))
        # Write the index entry to a temp file rather than mutating the
        # live bundle directory (a stale copy in the bundle would drift
        # from the index after later `edit`s).
        fd, tmp_path = tempfile.mkstemp(suffix=".json")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(entry, f)
            tar.add(tmp_path, arcname=f"{entry['id']}/metadata.json")
        finally:
            os.unlink(tmp_path)
    click.echo(f"Checkpoint {entry['id']} exported successfully.")


def build_remote_index(tar_dir, base_url=None):
    """Write an ``index.json`` describing the export tarballs in a dir.

    Together with ``export`` this makes any directory a self-hostable
    checkpoint zoo: point ``LUMI_REMOTE_INDEX_URL`` at the written index
    (``file://`` for a shared filesystem, ``http(s)://`` if served) and
    ``refresh``/``download`` resolve bundles from it — the native
    counterpart of the reference's hosted index
    (reference: luminoth/tools/checkpoint/__init__.py:21-24,270-332).

    ``base_url`` rewrites each bundle URL's prefix (for serving the dir
    at a different address); default is the tarballs' own ``file://``
    absolute paths.
    """
    entries = []
    for fname in sorted(os.listdir(tar_dir)):
        if not fname.endswith(".tar"):
            continue
        path = os.path.join(tar_dir, fname)
        root = fname[:-len(".tar")]
        with tarfile.open(path) as tar:
            try:
                member = tar.extractfile(f"{root}/metadata.json")
                entry = json.load(member)
            except KeyError:
                entry = {"id": root}
        if base_url:
            url = base_url.rstrip("/") + "/" + fname
        else:
            url = "file://" + os.path.abspath(path)
        entry.update(url=url, source="remote", status="NOT_DOWNLOADED")
        entries.append(entry)
    index_path = os.path.join(tar_dir, "index.json")
    with open(index_path, "w") as f:
        json.dump({"checkpoints": entries}, f, indent=2)
    return index_path


@checkpoint.command(
    "build-index",
    help="Build a remote-index file (index.json) from exported tarballs, "
         "making TAR_DIR a self-hostable checkpoint zoo.",
)
@click.argument("tar_dir")
@click.option(
    "--base-url", default=None,
    help="URL prefix the tarballs will be served under (default: their "
         "file:// paths).",
)
def build_index(tar_dir, base_url):
    index_path = build_remote_index(tar_dir, base_url=base_url)
    click.echo(f"Remote index written to {index_path}.")


@checkpoint.command("import", help="Imports a checkpoint tar.")
@click.argument("path")
def import_(path):
    with tarfile.open(path) as tar:
        names = tar.getnames()
        if not names:
            raise click.ClickException("Checkpoint tar is empty.")
        roots = {n.split("/")[0] for n in names}
        rooted = len(roots) == 1 and any("/" in n for n in names)
        if rooted:
            # export() layout: every member under one <id>/ root.
            root = next(iter(roots))
            safe_extractall(tar, get_checkpoints_directory())
        else:
            # Flat tar (config.yml etc. at the tar root — the layout
            # download_remote_checkpoint also accepts): extract into a
            # fresh bundle directory instead of spilling loose files
            # into the checkpoints index directory.
            root = str(uuid.uuid4())[:8]
            safe_extractall(
                tar, os.path.join(get_checkpoints_directory(), root)
            )
    bundle = os.path.join(get_checkpoints_directory(), root)
    metadata_path = os.path.join(bundle, "metadata.json")
    if os.path.exists(metadata_path):
        with open(metadata_path) as f:
            entry = json.load(f)
    else:
        entry = {"id": root, "source": "local", "status": "LOCAL"}
    if entry.get("id") and entry["id"] != root:
        # The index must point at a directory named by the entry id
        # (get_checkpoint_path resolves by id) — a flat tar extracts
        # into a random dir, so move it under the metadata's id.
        target = os.path.join(get_checkpoints_directory(), entry["id"])
        if os.path.exists(target):
            shutil.rmtree(bundle)
            raise click.ClickException(
                f"Checkpoint {entry['id']} already exists."
            )
        os.rename(bundle, target)
    entry["source"] = "local"
    entry["status"] = "LOCAL"
    db = read_checkpoint_db()
    merge_into_db(db, entry)
    save_checkpoint_db(db)
    click.echo(f"Checkpoint {entry['id']} imported successfully.")


@checkpoint.command(help="Refresh the remote checkpoint index.")
def refresh():
    try:
        fetch_remote_index()
        click.echo("Remote index refreshed.")
    except Exception as e:
        click.echo(f"Could not fetch remote index: {e}")


@checkpoint.command(
    "convert-backbone",
    help="Convert pretrained backbone weights (slim .ckpt or torchvision "
         ".pth) into native .npz weights.",
)
@click.argument("ckpt_path")
@click.argument("out_path")
@click.option(
    "--architecture", default="resnet_v1_101",
    help="Target architecture (resnet_v{1,2}_{50,101,152}, vgg_16 or "
         "truncated_vgg_16).",
)
@click.option(
    "--source", type=click.Choice(["auto", "slim", "torchvision"]),
    default="auto",
    help="Checkpoint format; 'auto' picks slim for .ckpt prefixes and "
         "torchvision for .pth files.",
)
def convert_backbone(ckpt_path, out_path, architecture, source):
    if source == "auto":
        base = ckpt_path.rsplit("/", 1)[-1]
        if base.endswith((".pth", ".pt")):
            source = "torchvision"
        elif ".ckpt" in base or not os.path.splitext(base)[1]:
            # slim checkpoints are "<name>.ckpt" prefixes (possibly with
            # .data-*/.index suffixes) or bare prefixes.
            source = "slim"
        else:
            raise click.UsageError(
                f"Can't infer the checkpoint format of '{ckpt_path}': "
                "expected a torchvision .pth/.pt file or a slim .ckpt "
                "prefix. Pass --source explicitly."
            )
    if source == "slim":
        from luminoth_tpu.tools.checkpoint.slim_convert import (
            convert_slim_checkpoint_file,
        )

        count = convert_slim_checkpoint_file(ckpt_path, out_path, architecture)
    else:
        from luminoth_tpu.tools.checkpoint.convert import (
            convert_backbone_file,
        )

        count = convert_backbone_file(ckpt_path, out_path, architecture)
    click.echo(f"Converted {count} arrays to {out_path}.")


@checkpoint.command(
    "convert-detector",
    help="Convert a trained reference (TF/Luminoth) detector checkpoint "
         "into a native checkpoint directory usable as train.job_dir.",
)
@click.argument("ckpt_path")
@click.argument("out_dir")
@click.option(
    "config_files", "--config", "-c", required=True, multiple=True,
    help="Model config matching the checkpoint (type, architecture, "
         "num_classes).",
)
def convert_detector(ckpt_path, out_dir, config_files):
    import os

    from luminoth_tpu.tools.checkpoint.zoo_convert import (
        convert_zoo_checkpoint,
    )
    from luminoth_tpu.utils.config import get_config

    # NB: builtin ``list`` is shadowed by the click command above.
    config = get_config([*config_files])
    n_loaded, n_total = convert_zoo_checkpoint(
        ckpt_path, os.path.join(out_dir, "ckpt"), config
    )
    click.echo(
        f"Converted {n_loaded}/{n_total} arrays into {out_dir}/ckpt. "
        f"Point train.job_dir at {out_dir} to predict/evaluate."
    )


@checkpoint.command(
    "download-backbone",
    help="Download + convert pretrained backbone weights (slim ImageNet "
         "checkpoints, the reference's pretrained source; or the "
         "torchvision zoo).",
)
@click.argument("architecture")
@click.option("--output", "-o", default=None, help="Output .npz path.")
@click.option(
    "--source", type=click.Choice(["slim", "torchvision"]), default="slim",
    help="Pretrained weight source.",
)
def download_backbone_cmd(architecture, output, source):
    import os

    from luminoth_tpu.utils.homedir import get_home

    try:
        if source == "slim":
            from luminoth_tpu.tools.checkpoint.slim_convert import (
                convert_slim_checkpoint_file,
                download_slim_backbone,
            )

            ckpt = download_slim_backbone(architecture)
            convert_fn = convert_slim_checkpoint_file
        else:
            from luminoth_tpu.tools.checkpoint.convert import (
                convert_backbone_file,
                download_backbone,
            )

            ckpt = download_backbone(architecture)
            convert_fn = convert_backbone_file
    except Exception as e:
        click.echo(f"Download failed ({e}). If offline, download the "
                   f"{source} checkpoint manually and run convert-backbone.")
        return
    output = output or os.path.join(
        get_home(), "pretrained", f"{architecture}.npz"
    )
    count = convert_fn(ckpt, output, architecture)
    click.echo(f"Saved {count} arrays to {output}. Use it with:\n"
               f"  model.base_network.weights: {output}")
    if source == "torchvision" and architecture.startswith("resnet"):
        click.echo("  model.base_network.torchvision_compat: True")


@checkpoint.command(help="Download a remote checkpoint.")
@click.argument("id_or_alias")
def download(id_or_alias):
    db = read_checkpoint_db()
    entry = get_checkpoint(db, id_or_alias)
    if entry is None:
        click.echo("Checkpoint not found.")
        return
    if entry.get("status") != "NOT_DOWNLOADED":
        click.echo("Checkpoint is already downloaded.")
        return
    download_remote_checkpoint(db, entry)
    click.echo("Checkpoint downloaded.")
