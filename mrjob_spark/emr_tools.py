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
* ``audit-emr-usage`` — the full usage/billing report
  (``audit_usage.py``): per-cluster state/age/steps plus the
  reference's complete normalized-instance-hour accounting — the
  API's own ``NormalizedInstanceHours`` field supplies the billing
  basis (no EC2 price tables needed), apportioned across bootstrap
  and step intervals (audit_usage.py:256-420) and broken down by
  date, hour, job label, owner, job step, and pool
  (audit_usage.py:135-253), with used / billed / billed-but-not-used
  totals and the waste split (end-of-cluster vs other).
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


# job keys are ``<label>.<owner>.<numeric tail>`` — ours is
# ``JobClass.user.<time_ns>`` (dataflow/emr.py:719), the reference's is
# ``module.user.YYYYMMDD.HHMMSS.microseconds`` (mrjob/job.py). Both are
# parsed so the audit labels clusters from either naming scheme; a
# non-matching name gets label=owner=None (a non-mrjob cluster), exactly
# like the reference (audit_usage.py:75-80).
_REF_JOB_KEY_RE = re.compile(r"^(.*)\.(.*)\.(\d+)\.(\d+)\.(\d+)$")
_OUR_JOB_KEY_RE = re.compile(r"^(.*)\.(.*)\.(\d+)$")
_REF_STEP_NAME_RE = re.compile(
    r"^(.*)\.(.*)\.(\d+)\.(\d+)\.(\d+): Step (\d+) of (\d+)$")
_OUR_STEP_NAME_RE = re.compile(r"^(.*)\.(.*)\.(\d+): Step (\d+) of (\d+)$")


def _parse_job_key(name: str):
    """(label, owner) from a cluster name, or (None, None)."""
    for pat in (_REF_JOB_KEY_RE, _OUR_JOB_KEY_RE):
        m = pat.match(name or "")
        if m:
            return m.group(1), m.group(2)
    return None, None


def _parse_step_name(name: str):
    """(label, owner, step_num) from a step name, or (None, None, None)."""
    for pat in (_REF_STEP_NAME_RE, _OUR_STEP_NAME_RE):
        m = pat.match(name or "")
        if m:
            return m.group(1), m.group(2), int(m.groups()[-2])
    return None, None, None


def _subdivide_by_date(start: float, end: float) -> dict:
    """UTC date string -> seconds of [start, end) on that date (the
    reference's ``_subdivide_interval_by_date``, audit_usage.py:520-550,
    over epoch floats)."""
    import datetime as _dt

    out: dict = {}
    cur = start
    while cur < end:
        day = _dt.datetime.fromtimestamp(cur, _dt.timezone.utc).date()
        next_midnight = _dt.datetime(
            day.year, day.month, day.day, tzinfo=_dt.timezone.utc
        ).timestamp() + 86400.0
        upto = min(end, next_midnight)
        out[day.isoformat()] = out.get(day.isoformat(), 0.0) + (upto - cur)
        cur = upto
    return {d: s for d, s in out.items() if s}


def _subdivide_by_hour(start: float, end: float) -> dict:
    """UTC 'YYYY-MM-DD HH' string -> seconds of [start, end) during that
    hour (the reference's ``_subdivide_interval_by_hour``,
    audit_usage.py:553-580)."""
    import datetime as _dt

    out: dict = {}
    cur = start
    while cur < end:
        hour_start = cur - (cur % 3600.0)
        label = _dt.datetime.fromtimestamp(
            hour_start, _dt.timezone.utc
        ).strftime("%Y-%m-%d %H")
        upto = min(end, hour_start + 3600.0)
        out[label] = out.get(label, 0.0) + (upto - cur)
        cur = upto
    return {h: s for h, s in out.items() if s}


def cluster_usage_intervals(cluster: dict, steps: list, now: float) -> list:
    """Per-interval usage apportionment for one cluster — the
    reference's ``_cluster_to_usage_data``
    (``mrjob/tools/emr/audit_usage.py:256-420``): the API's
    ``NormalizedInstanceHours`` counts FULL hours, so the per-second
    rate is ``nih / (ceil(ran_hours) * 3600)``; interval 0 is bootstrap
    (created→ready, labeled with the cluster's own job key), then one
    interval per STARTED step (labeled from the step name; a step that
    never got a StartDateTime ends the walk; a cancelled step on a
    finished cluster is credited 0 usage); each interval is billed until
    the NEXT interval starts — the last until the cluster's billing end
    (at least one minute, seconds rounded up). Every interval carries
    ``label/owner/step_num``, the three NIH figures, and the
    ``date_to_nih_*`` / ``hour_to_nih_*`` subdivision maps the report's
    daily/hourly statistics aggregate. Returns ``[]`` for a cluster with
    no creation time or no NIH."""
    import math

    timeline = cluster["Status"].get("Timeline", {})
    if timeline.get("CreationDateTime") is None:
        return []
    created = _to_epoch(timeline.get("CreationDateTime"))
    ready = timeline.get("ReadyDateTime")
    end = timeline.get("EndDateTime")
    nih = float(cluster.get("NormalizedInstanceHours") or 0)
    if not nih:
        return []
    label, owner = _parse_job_key(cluster.get("Name", ""))
    ran = max(0.0, (_to_epoch(end) if end else now) - created)
    full_hours = max(1, math.ceil(ran / 3600.0))
    nih_per_sec = nih / (full_hours * 3600.0)
    cluster_end_billing = created + max(math.ceil(ran), 60.0)

    intervals = [{
        "label": label,
        "owner": owner,
        "step_num": None,
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
        s_label, s_owner, s_num = _parse_step_name(step.get("Name", ""))
        intervals.append({
            "label": s_label,
            "owner": s_owner,
            "step_num": s_num,
            "start": _to_epoch(start),
            "end": _to_epoch(step_end),
        })
    for i in range(len(intervals) - 1):
        intervals[i]["end_billing"] = intervals[i + 1]["start"]
    intervals[-1]["end_billing"] = cluster_end_billing

    for iv in intervals:
        used_secs = max(0.0, iv["end"] - iv["start"])
        billed_secs = max(0.0, iv["end_billing"] - iv["start"])
        iv["nih_used"] = nih_per_sec * used_secs
        iv["nih_billed"] = nih_per_sec * billed_secs
        iv["nih_bbnu"] = iv["nih_billed"] - iv["nih_used"]
        iv["date_to_nih_used"] = {
            d: nih_per_sec * s
            for d, s in _subdivide_by_date(iv["start"], iv["end"]).items()
        }
        iv["hour_to_nih_used"] = {
            h: nih_per_sec * s
            for h, s in _subdivide_by_hour(iv["start"], iv["end"]).items()
        }
        iv["date_to_nih_billed"] = {
            d: nih_per_sec * s
            for d, s in _subdivide_by_date(
                iv["start"], iv["end_billing"]).items()
        }
        iv["hour_to_nih_billed"] = {
            h: nih_per_sec * s
            for h, s in _subdivide_by_hour(
                iv["start"], iv["end_billing"]).items()
        }
        iv["date_to_nih_bbnu"] = {
            d: b - iv["date_to_nih_used"].get(d, 0.0)
            for d, b in iv["date_to_nih_billed"].items()
            if b - iv["date_to_nih_used"].get(d, 0.0)
        }
        iv["hour_to_nih_bbnu"] = {
            h: b - iv["hour_to_nih_used"].get(h, 0.0)
            for h, b in iv["hour_to_nih_billed"].items()
            if b - iv["hour_to_nih_used"].get(h, 0.0)
        }
    return intervals


def cluster_nih(cluster: dict, steps: list, now: float) -> dict:
    """Cluster-total NIH accounting: the sum over
    :func:`cluster_usage_intervals` (the reference's
    ``_cluster_to_full_summary`` roll-up, audit_usage.py:149-166).
    Returns ``{"nih_billed", "nih_used", "nih_bbnu"}``."""
    ivs = cluster_usage_intervals(cluster, steps, now)
    billed = float(sum(iv["nih_billed"] for iv in ivs))
    used = float(sum(iv["nih_used"] for iv in ivs))
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


def clusters_to_stats(emr, now: float) -> dict:
    """The reference's full usage aggregation
    (``mrjob/tools/emr/audit_usage.py:135-253``): per-cluster summaries
    plus totals, the used/waste split (bootstrap vs jobs; end-of-cluster
    vs other), and the six breakdowns — ``date_to_nih_*``,
    ``hour_to_nih_*``, ``label_to_nih_*``, ``owner_to_nih_*``,
    ``job_step_to_nih_*`` (+ the ``_no_pool`` variant the report uses to
    rank un-pooled waste), and ``pool_to_nih_*`` — each in
    used/billed/bbnu flavors. Keys use ``None`` for non-mrjob clusters
    and non-pooled jobs, exactly like the reference."""
    clusters = []
    for summary in emr.list_clusters().get("Clusters") or []:
        cluster = emr.describe_cluster(ClusterId=summary["Id"])["Cluster"]
        steps = emr.list_steps(ClusterId=cluster["Id"]).get("Steps") or []
        usage = cluster_usage_intervals(cluster, steps, now)
        cs = {
            "id": cluster["Id"],
            "name": cluster.get("Name", ""),
            "pool": _tags(cluster).get(_POOL_NAME_TAG),
            "usage": usage,
            "nih_billed": float(sum(u["nih_billed"] for u in usage)),
            "nih_used": float(sum(u["nih_used"] for u in usage)),
        }
        cs["nih_bbnu"] = cs["nih_billed"] - cs["nih_used"]
        clusters.append(cs)

    s: dict = {"clusters": clusters}
    for nih_type in ("nih_billed", "nih_used", "nih_bbnu"):
        s[nih_type] = float(sum(cs[nih_type] for cs in clusters))

    # usage/waste split: interval 0 is bootstrap; the LAST interval's
    # bbnu is end-of-cluster idle
    s["bootstrap_nih_used"] = float(sum(
        cs["usage"][0]["nih_used"] for cs in clusters if cs["usage"]))
    s["job_nih_used"] = s["nih_used"] - s["bootstrap_nih_used"]
    s["end_nih_bbnu"] = float(sum(
        cs["usage"][-1]["nih_bbnu"] for cs in clusters if cs["usage"]))
    s["other_nih_bbnu"] = s["nih_bbnu"] - s["end_nih_bbnu"]

    for interval_type in ("date", "hour"):
        for nih_type in ("nih_billed", "nih_used", "nih_bbnu"):
            key = "%s_to_%s" % (interval_type, nih_type)
            start_to_nih: dict = {}
            for cs in clusters:
                for u in cs["usage"]:
                    for start, nih in u[key].items():
                        start_to_nih[start] = (
                            start_to_nih.get(start, 0.0) + nih)
            s[key] = start_to_nih

    for key in ("label", "owner"):
        for nih_type in ("nih_used", "nih_billed", "nih_bbnu"):
            key_to_nih: dict = {}
            for cs in clusters:
                for u in cs["usage"]:
                    key_to_nih[u[key]] = (
                        key_to_nih.get(u[key], 0.0) + u[nih_type])
            s["%s_to_%s" % (key, nih_type)] = key_to_nih

    # per job step (bootstrap excluded), with the un-pooled variant
    for nih_type in ("nih_used", "nih_billed", "nih_bbnu"):
        job_step_to_nih: dict = {}
        job_step_to_nih_no_pool: dict = {}
        for cs in clusters:
            for u in cs["usage"][1:]:
                job_step = (u["label"], u["step_num"])
                job_step_to_nih[job_step] = (
                    job_step_to_nih.get(job_step, 0.0) + u[nih_type])
                if not cs["pool"]:
                    job_step_to_nih_no_pool[job_step] = (
                        job_step_to_nih_no_pool.get(job_step, 0.0)
                        + u[nih_type])
        s["job_step_to_%s" % nih_type] = job_step_to_nih
        s["job_step_to_%s_no_pool" % nih_type] = job_step_to_nih_no_pool

    for nih_type in ("nih_used", "nih_billed", "nih_bbnu"):
        pool_to_nih: dict = {}
        for cs in clusters:
            pool_to_nih[cs["pool"]] = (
                pool_to_nih.get(cs["pool"], 0.0) + cs[nih_type])
        s["pool_to_%s" % nih_type] = pool_to_nih

    return s


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
    # the reference's headline totals + full breakdowns
    # (audit_usage.py:640-760 rendering over the :func:`clusters_to_stats`
    # aggregation)
    s = clusters_to_stats(emr, now)

    def pct(part, whole):
        return 100.0 * part / whole if whole else 0.0

    def with_pct(usage):
        return (usage, pct(usage, s["nih_billed"]))

    print()
    print("Total billed:  %9.2f  %5.1f%%" % with_pct(s["nih_billed"]))
    print("  Total used:  %9.2f  %5.1f%%" % with_pct(s["nih_used"]))
    print("    bootstrap: %9.2f  %5.1f%%"
          % with_pct(s["bootstrap_nih_used"]))
    print("    jobs:      %9.2f  %5.1f%%" % with_pct(s["job_nih_used"]))
    print("  Total waste: %9.2f  %5.1f%%" % with_pct(s["nih_bbnu"]))
    print("    at end:    %9.2f  %5.1f%%" % with_pct(s["end_nih_bbnu"]))
    print("    other:     %9.2f  %5.1f%%" % with_pct(s["other_nih_bbnu"]))

    if s["date_to_nih_billed"]:
        print("\nDaily statistics:")
        print(" date          billed      used     waste   % waste")
        for d in sorted(s["date_to_nih_billed"], reverse=True):
            billed = s["date_to_nih_billed"].get(d, 0.0)
            bbnu = s["date_to_nih_bbnu"].get(d, 0.0)
            print(" %10s %9.2f %9.2f %9.2f     %5.1f" % (
                d, billed, s["date_to_nih_used"].get(d, 0.0), bbnu,
                pct(bbnu, billed)))

    if s["hour_to_nih_billed"]:
        print("\nHourly statistics:")
        print(" hour              billed      used     waste   % waste")
        for h in sorted(s["hour_to_nih_billed"], reverse=True):
            billed = s["hour_to_nih_billed"].get(h, 0.0)
            bbnu = s["hour_to_nih_bbnu"].get(h, 0.0)
            print(" %13s  %9.2f %9.2f %9.2f     %5.1f" % (
                h, billed, s["hour_to_nih_used"].get(h, 0.0), bbnu,
                pct(bbnu, billed)))

    def top(mapping, fmt=lambda k: k if k is not None else "(non-mrjob)"):
        return sorted(
            ((v, fmt(k)) for k, v in mapping.items()),
            key=lambda vk: (-vk[0], str(vk[1])),
        )

    print("\nTop jobs, by total time used:")
    for v, label in top(s["label_to_nih_used"]):
        print("  %9.2f %s" % (v, label))
    print("\nTop jobs, by time billed but not used:")
    for v, label in top(s["label_to_nih_bbnu"]):
        print("  %9.2f %s" % (v, label))
    print("\nTop users, by total time used:")
    for v, owner in top(s["owner_to_nih_used"]):
        print("  %9.2f %s" % (v, owner))
    print("\nTop users, by time billed but not used:")
    for v, owner in top(s["owner_to_nih_bbnu"]):
        print("  %9.2f %s" % (v, owner))

    print("\nTop job steps, by total time used (step number first):")
    for v, key in top(
        s["job_step_to_nih_used"],
        fmt=lambda k: ("%3d %s" % (k[1], k[0])) if k[0]
        else "    (non-mrjob step)",
    ):
        print("  %9.2f %s" % (v, key))
    print("\nTop job steps, by time billed but not used"
          " (un-pooled only):")
    for v, key in top(
        s["job_step_to_nih_bbnu_no_pool"],
        fmt=lambda k: ("%3d %s" % (k[1], k[0])) if k[0]
        else "    (non-mrjob step)",
    ):
        print("  %9.2f %s" % (v, key))

    print("\nAll pools, by total time billed:")
    for v, pool in top(
        s["pool_to_nih_billed"],
        fmt=lambda k: k if k is not None else "(not pooled)",
    ):
        print("  %9.2f %s" % (v, pool))

    print("\ntotals: %.2f nih_billed, %.2f nih_used, %.2f nih_bbnu" % (
        s["nih_billed"], s["nih_used"], s["nih_bbnu"],
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
