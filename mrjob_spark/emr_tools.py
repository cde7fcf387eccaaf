"""EMR cluster-admin tools (reference ``mrjob/tools/emr/*``), exposed as
``mrjob`` umbrella subcommands:

* ``create-cluster`` — a persistent (WAITING) cluster, pool-tagged so
  jobs with the matching config hash can join it
  (``mrjob/tools/emr/create_cluster.py``).
* ``terminate-cluster <id>`` — ``terminate_cluster.py``.
* ``terminate-idle-clusters`` — reap WAITING clusters idle past a
  threshold; honors ``--dry-run``, ``--pool-name``, ``--pooled-only``
  and SKIPS clusters another job holds a non-expired pool lock on
  (``terminate_idle_clusters.py``; the lock skip is the 0.6.x behavior
  that stopped the tool racing job submission).
* ``audit-emr-usage`` — per-cluster and per-pool usage report
  (``audit_usage.py``, the basic-summary slice: state, age, steps;
  the reference's normalized-instance-hour billing math needs the EC2
  compute-unit tables, out of scope without AWS).
* ``report-long-jobs`` — steps running/pending longer than a threshold
  (``report_long_jobs.py``).
* ``s3-tmpwatch <age> <uri>`` — delete objects under a prefix older
  than the age (``s3_tmpwatch.py``; age spec like ``30d``, ``12h``,
  ``90m``).

* ``describe-base-emr-images`` — list the Amazon Linux images usable
  as EMR custom-AMI bases, newest first (``mrjob/ami.py``; the picker a
  user runs before ``create-cluster --image-id``).
* ``boss CLUSTER_ID "command"`` — run a command on the master and every
  worker over SSH (workers chained through the master) and store each
  node's stdout/stderr under an output dir (``mrboss.py``). Tests drive
  it end-to-end against the executing mock ssh binary
  (:mod:`mrjob_spark.testing.mockssh`), the same way the reference
  tests mrboss against its fake ssh.

Every command takes the clients from ``$MOCK_EMR_BASE_DIR`` (the
executing mock service) when set, else builds boto3 clients on
``--region`` — the same dual path as ``-r emr`` itself. The
calculation functions take explicit clients + ``now`` so tests drive
them deterministically on the mock's fake clock.
"""

from __future__ import annotations

import os
import re
import sys
import time

from mrjob_spark.dataflow.emr import (
    _POOL_HASH_TAG,
    _POOL_LOCK_TAG,
    _POOL_NAME_TAG,
    _parse_s3_uri,
    build_cluster_params,
    pool_config_hash,
)
from mrjob_spark.dataflow.objectstore import iter_objects, key_within

_ACTIVE_STATES = ["STARTING", "BOOTSTRAPPING", "RUNNING", "WAITING"]


def _to_epoch(value) -> float:
    """boto3 returns datetimes, the mock returns epoch floats."""
    if value is None:
        return 0.0
    if isinstance(value, (int, float)):
        return float(value)
    return value.timestamp()


def _tags(cluster: dict) -> dict:
    return {t["Key"]: t["Value"] for t in cluster.get("Tags") or []}


def _clients(region=None):
    """(emr_client, s3_client, now) — mock when $MOCK_EMR_BASE_DIR is
    set, boto3 otherwise."""
    mock_base = os.environ.get("MOCK_EMR_BASE_DIR")
    if mock_base:
        from mrjob_spark.testing.mockemr import MockEMRService

        svc = MockEMRService(mock_base)
        return svc.emr_client(), svc.s3_client(), svc.now
    import boto3

    return (
        boto3.client("emr", region_name=region),
        boto3.client("s3", region_name=region),
        time.time(),
    )


# ---------------------------------------------------------------------
# calculations (client-driven, `now`-explicit: unit-testable on the mock)
# ---------------------------------------------------------------------


def iter_active_clusters(emr):
    for summary in emr.list_clusters(
        ClusterStates=_ACTIVE_STATES
    ).get("Clusters") or []:
        yield emr.describe_cluster(ClusterId=summary["Id"])["Cluster"]


def cluster_idle_seconds(emr, cluster: dict, now: float) -> float:
    """Seconds since the cluster last did anything: the end of its last
    step, else its creation. A cluster with PENDING/RUNNING steps is
    never idle (returns 0)."""
    last = _to_epoch(
        cluster.get("Status", {}).get("Timeline", {})
        .get("CreationDateTime")
    )
    for step in emr.list_steps(ClusterId=cluster["Id"]).get("Steps") or []:
        state = step["Status"]["State"]
        if state in ("PENDING", "RUNNING"):
            return 0.0
        end = _to_epoch(step["Status"].get("Timeline", {})
                        .get("EndDateTime"))
        last = max(last, end)
    return max(0.0, now - last)


def cluster_is_locked(cluster: dict, now_real: float | None = None) -> bool:
    """A non-expired ``__mrjob_pool_lock`` means a job is between
    finding this cluster and its steps starting — don't reap it."""
    lock = _tags(cluster).get(_POOL_LOCK_TAG)
    if not lock:
        return False
    try:
        _job_key, expiry = lock.rsplit(" ", 1)
        return float(expiry) > (now_real if now_real is not None
                                else time.time())
    except ValueError:
        return False  # unparseable lock: ignore, like the runner


def find_idle_clusters(
    emr, now: float, max_mins_idle: float = 10.0,
    pool_name: str | None = None, pooled_only: bool = False,
) -> list:
    """(cluster, idle_seconds) pairs over the reap threshold."""
    out = []
    for cluster in iter_active_clusters(emr):
        if cluster["Status"]["State"] != "WAITING":
            continue
        tags = _tags(cluster)
        if pooled_only and _POOL_NAME_TAG not in tags:
            continue
        if pool_name is not None and tags.get(_POOL_NAME_TAG) != pool_name:
            continue
        if cluster_is_locked(cluster):
            continue
        idle = cluster_idle_seconds(emr, cluster, now)
        if idle > max_mins_idle * 60:
            out.append((cluster, idle))
    return out


def cluster_nih(cluster: dict, steps: list, now: float) -> dict:
    """Normalized-instance-hour accounting for one cluster — the
    reference's math (``mrjob/tools/emr/audit_usage.py:149-166,
    330-500``): the API's ``NormalizedInstanceHours`` counts FULL hours,
    so the per-second rate is ``nih / (ceil(ran_hours) * 3600)``;
    'used' time is bootstrap (created→ready) plus each started step's
    run; each interval is billed until the NEXT interval starts (the
    last until the cluster's billing end: at least one minute, rounded
    up to the next second); ``bbnu`` — billed-but-not-used — is the
    difference. Returns ``{"nih_billed", "nih_used", "nih_bbnu"}``."""
    import math

    timeline = cluster["Status"].get("Timeline", {})
    created = _to_epoch(timeline.get("CreationDateTime"))
    ready = timeline.get("ReadyDateTime")
    end = timeline.get("EndDateTime")
    nih = float(cluster.get("NormalizedInstanceHours") or 0)
    if created is None or not nih:
        return {"nih_billed": 0.0, "nih_used": 0.0, "nih_bbnu": 0.0}
    ran = max(0.0, (_to_epoch(end) if end else now) - created)
    full_hours = max(1, math.ceil(ran / 3600.0))
    nih_per_sec = nih / (full_hours * 3600.0)
    cluster_end_billing = created + max(math.ceil(ran), 60.0)

    # bootstrap interval, then one per STARTED step (a step that never
    # got a StartDateTime ends the walk; a cancelled step on a finished
    # cluster is credited 0 usage)
    intervals = [{
        "start": created,
        "end": _to_epoch(ready) if ready else (
            _to_epoch(end) if end else now
        ),
    }]
    for step in steps:
        st = step["Status"].get("Timeline", {})
        start = st.get("StartDateTime")
        if start is None:
            break
        step_end = st.get("EndDateTime")
        if step_end is None:
            step_end = start if end else now
        intervals.append({
            "start": _to_epoch(start), "end": _to_epoch(step_end),
        })
    for i in range(len(intervals) - 1):
        intervals[i]["end_billing"] = intervals[i + 1]["start"]
    intervals[-1]["end_billing"] = cluster_end_billing

    used = sum(
        nih_per_sec * max(0.0, iv["end"] - iv["start"])
        for iv in intervals
    )
    billed = sum(
        nih_per_sec * max(0.0, iv["end_billing"] - iv["start"])
        for iv in intervals
    )
    return {
        "nih_billed": billed,
        "nih_used": used,
        "nih_bbnu": billed - used,
    }


def collect_usage(emr, now: float) -> list:
    """Basic per-cluster summaries (the reference's
    ``_cluster_to_basic_summary`` slice) plus the NIH billing columns."""
    rows = []
    for summary in emr.list_clusters().get("Clusters") or []:
        cluster = emr.describe_cluster(ClusterId=summary["Id"])["Cluster"]
        steps = emr.list_steps(ClusterId=cluster["Id"]).get("Steps") or []
        created = _to_epoch(
            cluster["Status"].get("Timeline", {}).get("CreationDateTime")
        )
        tags = _tags(cluster)
        row = {
            "id": cluster["Id"],
            "name": cluster.get("Name", ""),
            "state": cluster["Status"]["State"],
            "created": created,
            "age_hours": max(0.0, now - created) / 3600.0,
            "num_steps": len(steps),
            "pool": tags.get(_POOL_NAME_TAG),
        }
        row.update(cluster_nih(cluster, steps, now))
        rows.append(row)
    return rows


def find_long_jobs(emr, now: float, min_hours: float) -> list:
    """(cluster_id, step, state, hours) for steps PENDING/RUNNING longer
    than *min_hours* (the reference's report_long_jobs)."""
    out = []
    for cluster in iter_active_clusters(emr):
        for step in emr.list_steps(
            ClusterId=cluster["Id"]
        ).get("Steps") or []:
            state = step["Status"]["State"]
            if state == "RUNNING":
                since = _to_epoch(step["Status"].get("Timeline", {})
                                  .get("StartDateTime"))
            elif state == "PENDING":
                since = _to_epoch(step["Status"].get("Timeline", {})
                                  .get("CreationDateTime"))
            else:
                continue
            hours = max(0.0, now - since) / 3600.0
            if hours >= min_hours:
                out.append((cluster["Id"], step, state, hours))
    return out


_AGE_RE = re.compile(r"^(\d+(?:\.\d+)?)([dhm]?)$")
_AGE_UNIT = {"d": 86400.0, "h": 3600.0, "m": 60.0, "": 86400.0}


def parse_age(spec: str) -> float:
    """``30d`` / ``12h`` / ``90m`` / bare days → seconds (the
    s3_tmpwatch age syntax)."""
    m = _AGE_RE.match(spec)
    if not m:
        raise ValueError("bad age %r (want e.g. 30d, 12h, 90m)" % spec)
    return float(m.group(1)) * _AGE_UNIT[m.group(2)]


def s3_tmpwatch(s3, uri: str, age_secs: float, dry_run: bool = False,
                now_real: float | None = None) -> list:
    """Delete objects under *uri* older than *age_secs*; returns the
    affected keys. Ages come from object LastModified (real time — the
    store's own stamps, not the mock clock)."""
    now_real = time.time() if now_real is None else now_real
    bucket, prefix = _parse_s3_uri(uri)
    doomed = []
    # paginated + boundary-checked: a >1000-key tmp dir must not leave
    # stragglers, and `tmp` must not sweep a sibling `tmp-keep` (ADVICE r7)
    for obj in list(iter_objects(s3, bucket, prefix)):
        if not key_within(obj["Key"], prefix):
            continue
        if now_real - _to_epoch(obj.get("LastModified")) > age_secs:
            doomed.append(obj["Key"])
            if not dry_run:
                s3.delete_object(Bucket=bucket, Key=obj["Key"])
    return doomed


# ---------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------


class UsageError(Exception):
    """Malformed tool command line. The umbrella dispatcher prints this
    and exits 2 — a trailing flag with no value or a typo'd option must
    not surface as an IndexError traceback or a silently-misparsed
    positional (round-8 ADVICE)."""


def _flagval(args: list, *names, default=None):
    for name in names:
        if name in args:
            i = args.index(name)
            args.pop(i)
            if i >= len(args):
                raise UsageError("option %s requires a value" % name)
            return args.pop(i)
    return default


def _positionals(args: list, known_switches=()) -> list:
    """Remaining positional args after ``_flagval`` extraction, rejecting
    any unrecognized leading-dash option explicitly — ``--typo value``
    used to leave ``value`` in the positionals where it was silently
    misparsed as a cluster id or command string."""
    unknown = [
        a for a in args
        if a.startswith("-") and a != "-" and a not in known_switches
    ]
    if unknown:
        raise UsageError(
            "unrecognized option(s): %s" % " ".join(unknown))
    return [a for a in args if not a.startswith("-") or a == "-"]


def create_cluster_main(args: list) -> int:
    args = list(args)
    region = _flagval(args, "--region")
    pool_name = _flagval(args, "--pool-name", default="default")
    release_label = _flagval(args, "--release-label",
                             default="emr-6.9.0")
    instance_type = _flagval(args, "--instance-type", default="m5.xlarge")
    num_core = int(_flagval(args, "--num-core-instances", default="2"))
    max_idle = float(_flagval(args, "--max-mins-idle", default="10"))
    log_uri = _flagval(args, "--cloud-log-dir",
                       default="s3://mrjob-spark-tmp/logs/")
    # round-9 surfaces: a tool-made pooled cluster must hash and look
    # exactly like a runner-made one, or jobs can't join it
    image_id = _flagval(args, "--image-id")
    job_flow_role = _flagval(args, "--iam-instance-profile")
    service_role = _flagval(args, "--iam-service-role")
    ec2_key_pair = _flagval(args, "--ec2-key-pair")
    apps_csv = _flagval(args, "--applications", default="Hadoop")
    applications = [a.strip() for a in apps_csv.split(",") if a.strip()]
    stray = _positionals(args)  # reject unrecognized flags AND positionals
    if stray:
        raise UsageError(
            "create-cluster takes no positional arguments (got: %s)"
            % " ".join(stray))
    emr, _s3, _now = _clients(region)
    params = build_cluster_params(
        name="mrjob-create-cluster.%d" % time.time_ns(),
        release_label=release_label,
        instance_type=instance_type,
        num_core_instances=num_core,
        ec2_key_pair=ec2_key_pair,
        applications=applications,
        log_uri=log_uri,
        keep_alive=True,
        max_mins_idle=max_idle,
        pool_name=pool_name,
        pool_hash=pool_config_hash(release_label, applications, [],
                                   image_id=image_id),
        job_flow_role=job_flow_role,
        service_role=service_role,
        image_id=image_id,
    )
    cluster_id = emr.run_job_flow(**params)["JobFlowId"]
    print(cluster_id)
    return 0


def terminate_cluster_main(args: list) -> int:
    args = list(args)
    region = _flagval(args, "--region")
    if len(args) != 1:
        print("usage: mrjob terminate-cluster [--region R] <cluster id>",
              file=sys.stderr)
        return 2
    emr, _s3, _now = _clients(region)
    emr.terminate_job_flows(JobFlowIds=[args[0]])
    print("Terminated cluster %s" % args[0], file=sys.stderr)
    return 0


def terminate_idle_clusters_main(args: list) -> int:
    args = list(args)
    region = _flagval(args, "--region")
    max_idle = float(_flagval(args, "--max-mins-idle", default="10"))
    pool_name = _flagval(args, "--pool-name")
    pooled_only = "--pooled-only" in args
    dry_run = "--dry-run" in args
    quiet = "-q" in args or "--quiet" in args
    emr, _s3, now = _clients(region)
    reaped = find_idle_clusters(
        emr, now, max_mins_idle=max_idle, pool_name=pool_name,
        pooled_only=pooled_only,
    )
    for cluster, idle in reaped:
        if not dry_run:
            emr.terminate_job_flows(JobFlowIds=[cluster["Id"]])
        if not quiet:
            print("%s %s (%s; idle for %d:%02d:%02d)" % (
                "Would terminate" if dry_run else "Terminated",
                cluster["Id"], cluster.get("Name", ""),
                idle // 3600, idle % 3600 // 60, idle % 60,
            ), file=sys.stderr)
    return 0


def audit_usage_main(args: list) -> int:
    args = list(args)
    region = _flagval(args, "--region")
    emr, _s3, now = _clients(region)
    rows = collect_usage(emr, now)
    print("%-14s %-9s %9s %6s %9s %9s %9s %-10s %s" % (
        "id", "state", "age_hrs", "steps",
        "nih_bill", "nih_used", "nih_bbnu", "pool", "name"
    ))
    for row in rows:
        print("%-14s %-9s %9.1f %6d %9.2f %9.2f %9.2f %-10s %s" % (
            row["id"], row["state"], row["age_hours"],
            row["num_steps"], row["nih_billed"], row["nih_used"],
            row["nih_bbnu"], row["pool"] or "-", row["name"],
        ))
    by_pool: dict = {}
    for row in rows:
        key = row["pool"] or "(unpooled)"
        agg = by_pool.setdefault(key, [0, 0.0, 0.0, 0.0, 0.0])
        agg[0] += 1
        agg[1] += row["age_hours"]
        agg[2] += row["nih_billed"]
        agg[3] += row["nih_used"]
        agg[4] += row["nih_bbnu"]
    print("\nusage by pool:")
    for pool in sorted(by_pool):
        n, hours, billed, used, bbnu = by_pool[pool]
        print("  %-12s %3d clusters %9.1f cluster-hours"
              " %9.2f nih_billed %9.2f nih_used %9.2f nih_bbnu"
              % (pool, n, hours, billed, used, bbnu))
    # the reference's headline totals (audit_usage.py:149-166)
    print("\ntotals: %.2f nih_billed, %.2f nih_used, %.2f nih_bbnu" % (
        sum(r["nih_billed"] for r in rows),
        sum(r["nih_used"] for r in rows),
        sum(r["nih_bbnu"] for r in rows),
    ))
    return 0


def report_long_jobs_main(args: list) -> int:
    args = list(args)
    region = _flagval(args, "--region")
    min_hours = float(_flagval(args, "--min-hours", default="24"))
    emr, _s3, now = _clients(region)
    for cluster_id, step, state, hours in find_long_jobs(
        emr, now, min_hours
    ):
        print("%s: %s in %s for %.1f hours (%s)" % (
            cluster_id, step["Id"], state, hours,
            step.get("Name", ""),
        ))
    return 0


def boss_addresses(emr, cluster_id: str) -> list:
    """SSH addresses for every node: the master plain, each running
    core/task node chained through it (``master!worker``) — the
    reference's ``mrboss`` address build
    (``mrjob/tools/emr/mrboss.py:115-125``)."""
    master = emr.describe_cluster(
        ClusterId=cluster_id
    )["Cluster"].get("MasterPublicDnsName")
    if not master:
        raise IOError("cluster %s has no master address" % cluster_id)
    addresses = [master]
    marker = None
    while True:
        kwargs = dict(
            ClusterId=cluster_id,
            InstanceGroupTypes=["CORE", "TASK"],
            InstanceStates=["RUNNING"],
        )
        if marker:
            kwargs["Marker"] = marker
        resp = emr.list_instances(**kwargs)
        for inst in resp.get("Instances") or []:
            addr = inst.get("PrivateIpAddress") or \
                inst.get("PrivateDnsName")
            if addr:
                addresses.append("%s!%s" % (master, addr))
        marker = resp.get("Marker")
        if not marker:
            return addresses


def run_on_all_nodes(emr, cluster_id: str, ssh_fs, output_dir: str,
                     cmd_args: list, echo=None) -> list:
    """Run *cmd_args* on the master and every worker of *cluster_id*,
    saving each node's stdout/stderr under *output_dir* — master under
    ``master/``, workers under ``worker <addr>/`` (the reference's
    layout, mrjob/tools/emr/mrboss.py:127-146). Returns the addresses
    reached."""
    reached = []
    for addr in boss_addresses(emr, cluster_id):
        stdout, stderr = ssh_fs.run(addr, list(cmd_args))
        if echo:
            echo("---")
            echo("Command completed on %s." % addr)
            echo(stderr.decode("utf-8", "replace").rstrip("\n"))
        if "!" in addr:
            base = os.path.join(output_dir,
                                "worker " + addr.split("!")[1])
        else:
            base = os.path.join(output_dir, "master")
        os.makedirs(base, exist_ok=True)
        with open(os.path.join(base, "stdout"), "wb") as fh:
            fh.write(stdout)
        with open(os.path.join(base, "stderr"), "wb") as fh:
            fh.write(stderr)
        reached.append(addr)
    return reached


def boss_main(args: list) -> int:
    """``mrjob boss CLUSTER_ID [options] "command string"`` — run a
    command on every node of the cluster over SSH and store per-node
    stdout/stderr (reference ``mrjob/tools/emr/mrboss.py``)."""
    import shlex

    from mrjob_spark.dataflow.sshfs import SSHFilesystem

    args = list(args)
    region = _flagval(args, "--region")
    output_dir = _flagval(args, "-o", "--output-dir")
    key_file = _flagval(args, "--ec2-key-pair-file")
    ssh_bin = _flagval(args, "--ssh-bin", default="ssh")
    ssh_add_bin = _flagval(args, "--ssh-add-bin")
    positional = _positionals(args)
    if len(positional) != 2 or not key_file:
        print('usage: mrjob boss --ec2-key-pair-file KEY [--ssh-bin SSH]'
              ' [-o DIR] CLUSTER_ID "command string"', file=sys.stderr)
        return 2
    cluster_id, cmd_string = positional
    emr, _s3, _now = _clients(region)
    fs = SSHFilesystem(
        shlex.split(ssh_bin), key_file,
        ssh_add_bin=shlex.split(ssh_add_bin) if ssh_add_bin else None,
    )
    out = os.path.abspath(output_dir or cluster_id)
    run_on_all_nodes(
        emr, cluster_id, fs, out, shlex.split(cmd_string),
        echo=lambda line: print(line, file=sys.stderr),
    )
    return 0


def _ec2_client(region=None):
    """EC2 client: mock when $MOCK_EMR_BASE_DIR is set, boto3 otherwise
    (the same dual path as :func:`_clients`)."""
    mock_base = os.environ.get("MOCK_EMR_BASE_DIR")
    if mock_base:
        from mrjob_spark.testing.mockemr import MockEMRService

        return MockEMRService(mock_base).ec2_client()
    import boto3

    return boto3.client("ec2", region_name=region)


def describe_base_emr_images_main(args: list) -> int:
    """``mrjob describe-base-emr-images [--region R] [--max N]`` — list
    the Amazon Linux images usable as custom-AMI bases for EMR, newest
    first (one ``ImageId  CreationDate  Description`` line each). The
    filter chain is :func:`mrjob_spark.dataflow.iam
    .describe_base_emr_images` (reference ``mrjob/ami.py:25-80``),
    reference-differential-tested in tests/test_emr_runner.py; this is
    the CLI a user runs BEFORE ``create-cluster --image-id`` to pick
    the base their packer/image-builder recipe starts from."""
    from mrjob_spark.dataflow.iam import describe_base_emr_images

    args = list(args)
    region = _flagval(args, "--region")
    max_results = int(_flagval(args, "--max", default="0"))
    stray = _positionals(args)
    if stray:
        raise UsageError(
            "describe-base-emr-images takes no positional arguments"
            " (got: %s)" % " ".join(stray))
    images = describe_base_emr_images(_ec2_client(region))
    if max_results > 0:
        images = images[:max_results]
    for img in images:
        print("%s  %s  %s" % (
            img["ImageId"], img.get("CreationDate", ""),
            img.get("Description", ""),
        ))
    return 0


def s3_tmpwatch_main(args: list) -> int:
    args = list(args)
    region = _flagval(args, "--region")
    dry_run = "--dry-run" in args
    positional = _positionals(args, known_switches=("--dry-run",))
    if len(positional) != 2:
        print("usage: mrjob s3-tmpwatch [--dry-run] <age (30d/12h/90m)>"
              " <s3 uri>", file=sys.stderr)
        return 2
    age, uri = positional
    _emr, s3, _now = _clients(region)
    doomed = s3_tmpwatch(s3, uri, parse_age(age), dry_run=dry_run)
    for key in doomed:
        print("%s s3://%s/%s" % (
            "Would delete" if dry_run else "Deleted",
            _parse_s3_uri(uri)[0], key,
        ), file=sys.stderr)
    return 0
