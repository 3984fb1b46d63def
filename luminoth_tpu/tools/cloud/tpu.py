"""Cloud TPU job submission: the TPU-native replacement for ML Engine.

reference: luminoth/tools/cloud/gcloud.py — the reference packages an sdist
and submits a parameter-server TF job to Google Cloud ML Engine
(:92-140 package upload, :297-323 PS/worker cluster spec, :449-536 job
list/logs). That product no longer matches the TPU execution model, so this
module replaces it with Cloud TPU VM orchestration via the ``gcloud`` CLI:

* ``lumi cloud tpu train`` — create (or reuse) a TPU VM/pod, rsync the
  config + code, and launch ``lumi train`` on every host. Multi-host
  pods get ``LUMI_DISTRIBUTED_AUTO=1``: the trainer's
  ``jax.distributed.initialize()`` resolves the coordinator from the
  TPU metadata server (see ``parallel/distributed.py``).
* ``lumi cloud tpu spec`` — emit the launch commands without executing
  anything (inspectable, and testable without credentials).
* ``lumi cloud tpu jobs`` / ``logs`` / ``delete`` — thin wrappers over
  ``gcloud compute tpus``.

Synchronous data parallelism over ICI/DCN replaces the PS/worker cluster:
no master/worker/ps counts — every host runs the same program.
"""

import json
import shlex
import subprocess

import click

DEFAULT_ACCELERATOR = "v5litepod-8"
DEFAULT_VERSION = "tpu-ubuntu2204-base"


def _run(cmd, dry_run=False, stream=False):
    """Echo + run a gcloud command.

    ``stream=True`` inherits stdout/stderr and never raises on exit
    status — for never-ending remote commands (``tail -f``) where a
    captured run would block forever printing nothing.
    """
    click.echo("$ " + " ".join(shlex.quote(c) for c in cmd))
    if dry_run:
        return None
    try:
        if stream:
            return subprocess.run(cmd, check=False)
        return subprocess.run(cmd, check=True, capture_output=True, text=True)
    except FileNotFoundError:
        raise click.ClickException(
            "`gcloud` CLI not found; install the Google Cloud SDK or use "
            "`lumi cloud tpu spec` to generate the commands."
        )
    except subprocess.CalledProcessError as e:
        raise click.ClickException(e.stderr or str(e))


def _detached(command, log_name):
    """Wrap a remote command so the ssh returns immediately.

    ``lumi train``/``lumi eval --watch`` run for the life of the job; a
    blocking ssh would hang the submitter (and for multi-host training,
    worker 1's launch would wait on worker 0's whole run). The job runs
    under ``nohup`` with its output in ``~/<log_name>`` — tail it with
    ``lumi cloud tpu logs``.
    """
    return (
        f"nohup sh -c {shlex.quote(command)} >> $HOME/{log_name} 2>&1 "
        f'< /dev/null & echo "launched pid $! -- log: ~/{log_name}"'
    )


def build_launch_spec(name, zone, accelerator, version, config_path,
                      num_hosts, job_dir=None,
                      dataset_dir=None, bucket=None, overrides=()):
    """The per-host launch commands for a distributed training job.

    ``job_dir`` points the run at a (typically ``gs://``) directory; an
    existing checkpointed run there resumes — the reference's
    ``--resume <job_id>`` (tools/cloud/gcloud.py:238,267-270) maps to
    re-submitting with the same ``job_dir``. ``dataset_dir`` + ``bucket``
    upload a local dataset to GCS and override ``dataset.dir`` so every
    host reads it, replacing the reference's ``--dataset`` upload
    (tools/cloud/gcloud.py:236-266). ``overrides`` are ``-o key=value``
    config overrides passed through to the remote ``lumi train``.
    """
    create_cmd = [
        "gcloud", "compute", "tpus", "tpu-vm", "create", name,
        f"--zone={zone}",
        f"--accelerator-type={accelerator}",
        f"--version={version}",
    ]
    from luminoth_tpu.parallel.distributed import worker_env_auto

    # A local config file must be shipped to every host before launch;
    # GCS/HTTP paths are readable from the VM directly.
    copy_cmds = []
    if not config_path.startswith(("gs://", "http://", "https://")):
        remote_config = "~/lumi-config.yml"
        copy_cmds.append(
            [
                "gcloud", "compute", "tpus", "tpu-vm", "scp", config_path,
                f"{name}:{remote_config}", f"--zone={zone}",
                "--worker=all",
            ]
        )
        config_path = remote_config

    overrides = list(overrides)
    if dataset_dir:
        if dataset_dir.startswith("gs://"):
            remote_dataset = dataset_dir
        else:
            if not bucket:
                raise ValueError(
                    "--dataset with a local path needs --bucket to upload to"
                )
            remote_dataset = f"gs://{bucket.removeprefix('gs://')}" \
                f"/lumi-datasets/{name}"
            copy_cmds.append(
                ["gsutil", "-m", "rsync", "-r", dataset_dir, remote_dataset]
            )
        overrides.append(f"dataset.dir={remote_dataset}")
    if job_dir:
        overrides.append(f"train.job_dir={job_dir}")

    train_cmd = f"lumi train -c {config_path}"
    for ov in overrides:
        train_cmd += f" -o {shlex.quote(ov)}"

    # Multi-host pods use JAX's Cloud TPU auto-detection
    # (LUMI_DISTRIBUTED_AUTO=1 → jax.distributed.initialize() resolves
    # worker 0's address from the TPU metadata server). A coordinator
    # hostname fabricated here on the submitter would not resolve on
    # the workers. Single-host jobs need no distributed init at all.
    env_vars = worker_env_auto() if num_hosts > 1 else {}
    env = " ".join(f"{k}={v}" for k, v in env_vars.items())
    worker_cmds = []
    for process_id in range(num_hosts):
        launch = f"{env} {train_cmd}" if env else train_cmd
        worker_cmds.append(
            [
                "gcloud", "compute", "tpus", "tpu-vm", "ssh", name,
                f"--zone={zone}", f"--worker={process_id}", "--command",
                _detached(launch, f"lumi-train-w{process_id}.log"),
            ]
        )
    return {"create": create_cmd, "copy": copy_cmds, "train": worker_cmds}


def build_eval_spec(name, zone, config_path, split="val", watch=True,
                    platform="cpu"):
    """The ssh command for an evaluation job on an existing TPU VM.

    Replaces the reference's ML Engine evaluation job submission
    (tools/cloud/gcloud.py:349-446): the evaluator runs next to the
    training job (process 0's host) and watches its checkpoint dir.

    ``platform`` defaults to ``cpu``: libtpu is single-process, so an
    evaluator sharing the host with a live training job cannot acquire
    the TPU — it evaluates on the host CPUs instead (the reference's
    evaluator likewise ran on separate non-accelerated workers). Pass
    ``tpu`` only when nothing else holds the chips.
    """
    copy_cmds = []
    if not config_path.startswith(("gs://", "http://", "https://")):
        remote_config = "~/lumi-eval-config.yml"
        copy_cmds.append(
            [
                "gcloud", "compute", "tpus", "tpu-vm", "scp", config_path,
                f"{name}:{remote_config}", f"--zone={zone}", "--worker=0",
            ]
        )
        config_path = remote_config
    eval_cmd = f"lumi eval -c {config_path} --split {split}"
    if not watch:
        eval_cmd += " --no-watch"
    if platform:
        eval_cmd = f"JAX_PLATFORMS={platform} {eval_cmd}"
    return {
        "copy": copy_cmds,
        "eval": [
            "gcloud", "compute", "tpus", "tpu-vm", "ssh", name,
            f"--zone={zone}", "--worker=0", "--command",
            _detached(eval_cmd, "lumi-eval.log"),
        ],
    }


@click.group(help="Train and manage jobs on Cloud TPU")
def tpu():
    pass


@tpu.command(help="Create a TPU and launch a distributed training job.")
@click.option("--name", required=True, help="TPU VM/pod name.")
@click.option("--zone", default="us-central1-a")
@click.option("--accelerator-type", default=DEFAULT_ACCELERATOR)
@click.option("--runtime-version", default=DEFAULT_VERSION)
@click.option("config_path", "--config", "-c", required=True)
@click.option("--num-hosts", type=int, default=1,
              help="Number of TPU hosts (pod slices have several).")
@click.option("--job-dir", default=None,
              help="Run/checkpoint dir (gs://...); reuse to resume a job.")
@click.option("--dataset", "dataset_dir", default=None,
              help="Dataset dir (local uploads to --bucket; gs:// as-is).")
@click.option("--bucket", default=None,
              help="GCS bucket for uploading a local --dataset.")
@click.option("overrides", "--override", "-o", multiple=True,
              help="Override model config params on the remote train.")
@click.option("--dry-run", is_flag=True,
              help="Print the commands without executing them.")
def train(name, zone, accelerator_type, runtime_version, config_path,
          num_hosts, job_dir, dataset_dir, bucket, overrides, dry_run):
    spec = build_launch_spec(
        name, zone, accelerator_type, runtime_version, config_path,
        num_hosts, job_dir=job_dir, dataset_dir=dataset_dir, bucket=bucket,
        overrides=overrides,
    )
    # Reuse an existing TPU (the documented resume flow re-submits with
    # the same --name/--job-dir): `create` errors on a live TPU, so
    # probe with `describe` first and only create when absent.
    describe_cmd = [
        "gcloud", "compute", "tpus", "tpu-vm", "describe", name,
        f"--zone={zone}",
    ]
    exists = False
    if not dry_run:
        try:
            _run(describe_cmd)
            exists = True
            click.echo(f"TPU {name} already exists; reusing it.")
        except click.ClickException:
            exists = False
    if not exists:
        _run(spec["create"], dry_run=dry_run)
    for cmd in spec["copy"]:
        _run(cmd, dry_run=dry_run)
    for cmd in spec["train"]:
        _run(cmd, dry_run=dry_run)


@tpu.command(help="Print the launch spec for a distributed training job.")
@click.option("--name", required=True)
@click.option("--zone", default="us-central1-a")
@click.option("--accelerator-type", default=DEFAULT_ACCELERATOR)
@click.option("--runtime-version", default=DEFAULT_VERSION)
@click.option("config_path", "--config", "-c", required=True)
@click.option("--num-hosts", type=int, default=1)
@click.option("--job-dir", default=None)
@click.option("--dataset", "dataset_dir", default=None)
@click.option("--bucket", default=None)
@click.option("overrides", "--override", "-o", multiple=True)
def spec(name, zone, accelerator_type, runtime_version, config_path,
         num_hosts, job_dir, dataset_dir, bucket, overrides):
    payload = build_launch_spec(
        name, zone, accelerator_type, runtime_version, config_path,
        num_hosts, job_dir=job_dir, dataset_dir=dataset_dir, bucket=bucket,
        overrides=overrides,
    )
    click.echo(json.dumps(payload, indent=2))


@tpu.command(help="Start an evaluation job on an existing TPU VM.")
@click.option("--name", required=True, help="TPU VM the training runs on.")
@click.option("--zone", default="us-central1-a")
@click.option("config_path", "--config", "-c", required=True)
@click.option("dataset_split", "--split", default="val",
              help="Dataset split to use.")
@click.option("--watch/--no-watch", default=True,
              help="Keep watching the checkpoint dir for new files.")
@click.option("--platform", default="cpu",
              type=click.Choice(["cpu", "tpu"]),
              help="Evaluator device; cpu coexists with a training job.")
@click.option("--dry-run", is_flag=True)
def evaluate(name, zone, config_path, dataset_split, watch, platform,
             dry_run):
    spec_dict = build_eval_spec(
        name, zone, config_path, split=dataset_split, watch=watch,
        platform=platform,
    )
    for cmd in spec_dict["copy"]:
        _run(cmd, dry_run=dry_run)
    result = _run(spec_dict["eval"], dry_run=dry_run)
    if result is not None:
        click.echo(result.stdout)


@tpu.command(help="List TPU VMs.")
@click.option("--zone", default="us-central1-a")
@click.option("--dry-run", is_flag=True)
def jobs(zone, dry_run):
    result = _run(
        ["gcloud", "compute", "tpus", "tpu-vm", "list", f"--zone={zone}"],
        dry_run=dry_run,
    )
    if result is not None:
        click.echo(result.stdout)


@tpu.command(help="Tail the training logs of a TPU job.")
@click.option("--name", required=True)
@click.option("--zone", default="us-central1-a")
@click.option("--dry-run", is_flag=True)
def logs(name, zone, dry_run):
    cmd = [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", name,
        f"--zone={zone}", "--command",
        "tail -f ~/lumi-*.log 2>/dev/null || tail -f ~/nohup.out",
    ]
    try:
        _run(cmd, dry_run=dry_run, stream=True)  # Ctrl-C ends the tail
    except KeyboardInterrupt:
        pass


@tpu.command(help="Delete a TPU VM.")
@click.option("--name", required=True)
@click.option("--zone", default="us-central1-a")
@click.option("--dry-run", is_flag=True)
def delete(name, zone, dry_run):
    _run(
        [
            "gcloud", "compute", "tpus", "tpu-vm", "delete", name,
            f"--zone={zone}", "--quiet",
        ],
        dry_run=dry_run,
    )
