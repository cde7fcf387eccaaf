"""EMR cluster-admin tools (reference ``mrjob/tools/emr/*``) — the
umbrella subcommands over the executing mock service, plus the
client-driven calculation functions against hand-built client stubs
(deterministic timestamps without racing the mock's per-call clock)."""

import os
import time

import pytest

from mrjob_spark.cmd import main as umbrella_main
from mrjob_spark.dataflow.emr import EMRJobRunner
from mrjob_spark.dataflow.job import SparkMRJob
from mrjob_spark.dataflow.step import MRStep
from mrjob_spark.emr_tools import (
    cluster_idle_seconds,
    cluster_is_locked,
    find_idle_clusters,
    find_long_jobs,
    parse_age,
    s3_tmpwatch,
)
from mrjob_spark.testing.mockemr import MockEMRService


class MRWordFreq(SparkMRJob):
    def steps(self):
        return [MRStep(mapper=self.m, reducer=self.r)]

    def m(self, _, line):
        for w in line.split():
            yield w.lower(), 1

    def r(self, w, counts):
        yield w, sum(counts)


# ---------------------------------------------------------------------
# calculation functions against a stub client
# ---------------------------------------------------------------------


class StubEMR:
    """Minimal boto3-shaped client over literal dicts — timestamps are
    whatever the test says they are."""

    def __init__(self, clusters, steps_by_cluster):
        self._clusters = {c["Id"]: c for c in clusters}
        self._steps = steps_by_cluster
        self.terminated = []

    def list_clusters(self, ClusterStates=None, **_):
        return {"Clusters": [
            {"Id": c["Id"], "Name": c.get("Name", ""), "Status": c["Status"]}
            for c in self._clusters.values()
            if not ClusterStates or c["Status"]["State"] in ClusterStates
        ]}

    def describe_cluster(self, ClusterId):
        return {"Cluster": self._clusters[ClusterId]}

    def list_steps(self, ClusterId, **_):
        return {"Steps": self._steps.get(ClusterId, [])}

    def terminate_job_flows(self, JobFlowIds):
        self.terminated += JobFlowIds


def _cluster(cid, state="WAITING", created=1000.0, tags=None):
    return {
        "Id": cid, "Name": cid, "StepConcurrencyLevel": 1,
        "Status": {"State": state, "StateChangeReason": {},
                   "Timeline": {"CreationDateTime": created}},
        "Tags": [{"Key": k, "Value": v} for k, v in (tags or {}).items()],
    }


def _step(sid, state, created=1000.0, start=None, end=None):
    tl = {"CreationDateTime": created}
    if start is not None:
        tl["StartDateTime"] = start
    if end is not None:
        tl["EndDateTime"] = end
    return {"Id": sid, "Name": sid, "Status": {"State": state,
                                               "Timeline": tl}}


def test_idle_seconds_uses_last_step_end():
    emr = StubEMR(
        [_cluster("j-1", created=1000.0)],
        {"j-1": [_step("s-1", "COMPLETED", end=5000.0)]},
    )
    c = emr.describe_cluster("j-1")["Cluster"]
    assert cluster_idle_seconds(emr, c, now=8000.0) == 3000.0


def test_active_steps_mean_not_idle():
    emr = StubEMR(
        [_cluster("j-1", created=1000.0)],
        {"j-1": [_step("s-1", "RUNNING", start=1500.0)]},
    )
    c = emr.describe_cluster("j-1")["Cluster"]
    assert cluster_idle_seconds(emr, c, now=999999.0) == 0.0


def test_find_idle_skips_locked_and_filters_pool():
    fresh_lock = "job.key %f" % (time.time() + 60)
    stale_lock = "job.key %f" % (time.time() - 60)
    emr = StubEMR(
        [
            _cluster("j-idle", tags={"__mrjob_pool_name": "default"}),
            _cluster("j-locked", tags={"__mrjob_pool_name": "default",
                                       "__mrjob_pool_lock": fresh_lock}),
            _cluster("j-stale-lock",
                     tags={"__mrjob_pool_name": "default",
                           "__mrjob_pool_lock": stale_lock}),
            _cluster("j-other-pool",
                     tags={"__mrjob_pool_name": "nightly"}),
            _cluster("j-unpooled"),
            _cluster("j-busy"),
        ],
        {"j-busy": [_step("s-1", "RUNNING", start=1500.0)]},
    )
    got = find_idle_clusters(emr, now=999999.0, max_mins_idle=10,
                             pool_name="default")
    assert sorted(c["Id"] for c, _ in got) == ["j-idle", "j-stale-lock"]

    got = find_idle_clusters(emr, now=999999.0, max_mins_idle=10,
                             pooled_only=True)
    assert sorted(c["Id"] for c, _ in got) == [
        "j-idle", "j-other-pool", "j-stale-lock"
    ]
    assert cluster_is_locked(emr.describe_cluster("j-locked")["Cluster"])


def test_find_long_jobs():
    emr = StubEMR(
        [_cluster("j-1", state="RUNNING")],
        {"j-1": [
            _step("s-running", "RUNNING", start=0.0),
            _step("s-pending", "PENDING", created=0.0),
            _step("s-done", "COMPLETED", start=0.0, end=10.0),
        ]},
    )
    got = find_long_jobs(emr, now=2 * 3600.0, min_hours=1.0)
    assert sorted((sid["Id"], state) for _, sid, state, _ in got) == [
        ("s-pending", "PENDING"), ("s-running", "RUNNING"),
    ]
    assert all(abs(hours - 2.0) < 0.01 for _, _, _, hours in got)


def test_parse_age():
    assert parse_age("30d") == 30 * 86400
    assert parse_age("12h") == 12 * 3600
    assert parse_age("90m") == 90 * 60
    assert parse_age("7") == 7 * 86400
    with pytest.raises(ValueError):
        parse_age("soon")


# ---------------------------------------------------------------------
# end-to-end over the mock service + umbrella command
# ---------------------------------------------------------------------


def test_create_cluster_tool_then_job_pools_onto_it(
    tmp_path, monkeypatch, capsys,
):
    base = tmp_path / "emr"
    monkeypatch.setenv("MOCK_EMR_BASE_DIR", str(base))
    rc = umbrella_main(["mrjob", "create-cluster"])
    assert rc == 0
    cluster_id = capsys.readouterr().out.strip()
    assert cluster_id.startswith("j-")

    svc = MockEMRService(base)
    svc.sleep(1)
    svc.sleep(1)  # STARTING → BOOTSTRAPPING → WAITING
    assert svc.clusters[cluster_id]["Status"]["State"] == "WAITING"

    # a pooled job with the default config must JOIN the tool's cluster
    # (same pool hash) instead of creating its own
    src = tmp_path / "in.txt"
    src.write_text("apple banana apple\n")
    runner = EMRJobRunner(
        MRWordFreq(), input_paths=[str(src)],
        emr_client=svc.emr_client(), s3_client=svc.s3_client(),
        pool_clusters=True, check_cluster_every=0.0,
    )
    with runner:
        runner.run()
        assert runner.get_cluster_id() == cluster_id
        assert sorted(runner.cat_output())[0] == ("apple", 2)


def test_terminate_cluster_tool(tmp_path, monkeypatch, capsys):
    base = tmp_path / "emr"
    monkeypatch.setenv("MOCK_EMR_BASE_DIR", str(base))
    assert umbrella_main(["mrjob", "create-cluster"]) == 0
    cluster_id = capsys.readouterr().out.strip()
    assert umbrella_main(
        ["mrjob", "terminate-cluster", cluster_id]
    ) == 0
    svc = MockEMRService(base)
    assert svc.clusters[cluster_id]["Status"]["State"] == "TERMINATED"


def test_terminate_idle_clusters_tool(tmp_path, monkeypatch, capsys):
    base = tmp_path / "emr"
    monkeypatch.setenv("MOCK_EMR_BASE_DIR", str(base))
    # a generous self-termination policy, so the EXTERNAL reaper (the
    # tool under test) is the thing that terminates it
    assert umbrella_main(["mrjob", "create-cluster",
                          "--max-mins-idle", "1440"]) == 0
    cluster_id = capsys.readouterr().out.strip()
    svc = MockEMRService(base)
    svc.sleep(1)
    svc.sleep(1)
    assert svc.clusters[cluster_id]["Status"]["State"] == "WAITING"
    svc.sleep(30 * 60)  # half an hour idle on the fake clock

    # dry run: reported but alive
    assert umbrella_main(["mrjob", "terminate-idle-clusters",
                          "--max-mins-idle", "10", "--dry-run"]) == 0
    svc2 = MockEMRService(base)
    assert svc2.clusters[cluster_id]["Status"]["State"] == "WAITING"

    assert umbrella_main(["mrjob", "terminate-idle-clusters",
                          "--max-mins-idle", "10"]) == 0
    svc3 = MockEMRService(base)
    assert svc3.clusters[cluster_id]["Status"]["State"].startswith(
        "TERMINATED"
    )


def test_audit_usage_tool(tmp_path, monkeypatch, capsys):
    base = tmp_path / "emr"
    monkeypatch.setenv("MOCK_EMR_BASE_DIR", str(base))
    assert umbrella_main(["mrjob", "create-cluster"]) == 0
    cluster_id = capsys.readouterr().out.strip()
    assert umbrella_main(["mrjob", "audit-emr-usage"]) == 0
    out = capsys.readouterr().out
    assert cluster_id in out
    assert "usage by pool" in out
    assert "default" in out


def test_create_cluster_with_image_id_pools_with_matching_job(
        tmp_path, monkeypatch, capsys):
    """A tool-made cluster on a custom AMI is joinable ONLY by jobs on
    the same image — image_id is pooled software identity for the tool
    exactly as for the runner."""
    base = tmp_path / "emr"
    monkeypatch.setenv("MOCK_EMR_BASE_DIR", str(base))
    assert umbrella_main(
        ["mrjob", "create-cluster", "--image-id", "ami-newest",
         "--iam-instance-profile", "MyProfile",
         "--iam-service-role", "MyRole"]) == 0
    cluster_id = capsys.readouterr().out.strip()
    svc = MockEMRService(base)
    assert svc.clusters[cluster_id]["_custom_ami_id"] == "ami-newest"
    assert svc.clusters[cluster_id]["_job_flow_role"] == "MyProfile"
    svc.sleep(1)
    svc.sleep(1)
    inp = tmp_path / "in.txt"
    inp.write_text("a b a\n")

    def run_job(**kw):
        r = EMRJobRunner(
            MRWordFreq(), input_paths=[str(inp)],
            emr_client=svc.emr_client(), s3_client=svc.s3_client(),
            check_cluster_every=0.0, pool_clusters=True, **kw,
        )
        r.run()
        cid = r.get_cluster_id()
        r.cleanup()
        svc.sleep(1)
        return cid

    assert run_job(image_id="ami-older") != cluster_id  # wrong image
    assert run_job(image_id="ami-newest") == cluster_id  # joins the tool's


def test_create_cluster_rejects_unknown_flags(tmp_path, monkeypatch):
    from mrjob_spark.emr_tools import UsageError, create_cluster_main

    with pytest.raises(UsageError, match="unrecognized"):
        create_cluster_main(["--immage-id", "oops"])


def test_reference_audit_usage_runs_on_mock(tmp_path, input_file=None):
    """The REFERENCE's own audit-emr-usage tool, driven end-to-end
    against our mock EMR through the fakeboto3 shim: it paginates
    list_clusters, describes each cluster, walks steps, and computes
    NIH billing from NormalizedInstanceHours over aware-datetime
    Timelines (the shim converts the mock's epoch floats). Its
    Total-billed figure must agree with our own audit's nih_billed
    over the same mock state."""
    import re
    import subprocess
    import sys

    import mrjob_spark

    ref = os.environ.get("MRJOB_REFERENCE_PATH", "/root/reference")
    if not os.path.isdir(os.path.join(ref, "mrjob")):
        pytest.skip("reference checkout not available")
    repo_root = os.path.dirname(os.path.dirname(
        os.path.abspath(mrjob_spark.__file__)))
    fakeboto3 = os.path.join(
        repo_root, "mrjob_spark", "testing", "fakeboto3")

    # seed the mock with one terminated job cluster + one WAITING pooled
    svc = MockEMRService(tmp_path / "emr", tick_secs=30.0)
    inp = tmp_path / "in.txt"
    inp.write_text("apple banana apple\n")
    for pool in (False, True):
        r = EMRJobRunner(
            MRWordFreq(), input_paths=[str(inp)],
            emr_client=svc.emr_client(), s3_client=svc.s3_client(),
            check_cluster_every=0.0, pool_clusters=pool,
        )
        r.run()
        r.cleanup()
    svc.sleep(3600)  # age the clusters into a billable hour
    # terminate everything: the mock clock lives near the 1970 epoch, so
    # a still-WAITING cluster would make the reference bill an interval
    # from 1970 to real wall-clock now and iterate its hourly-statistics
    # loop half a million times
    emr = svc.emr_client()
    for cid, c in list(svc.clusters.items()):
        if not c["Status"]["State"].startswith("TERMINAT"):
            emr.terminate_job_flows(JobFlowIds=[cid])
    svc.sleep(60)

    from mrjob_spark.emr_tools import collect_usage

    ours = collect_usage(svc.emr_client(), svc.now)
    our_billed = sum(row["nih_billed"] for row in ours)
    assert our_billed > 0

    env = dict(
        os.environ,
        MOCK_EMR_BASE_DIR=str(tmp_path / "emr"),
        PYTHONPATH=os.pathsep.join(
            [fakeboto3, ref, repo_root,
             os.environ.get("PYTHONPATH", "")]),
    )
    proc = subprocess.run(
        [sys.executable, "-m", "mrjob.tools.emr.audit_usage",
         "--no-conf", "-q"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        timeout=180,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-3000:]
    out = proc.stdout.decode()
    n_clusters = len(svc.clusters)
    assert ("Total  # of Clusters: %d" % n_clusters) in out
    m = re.search(r"Total billed:\s+([0-9.]+)", out)
    assert m, out[-3000:]
    # same NormalizedInstanceHours basis → totals agree to the cent
    assert abs(float(m.group(1)) - our_billed) < 0.01, (
        m.group(1), our_billed)

    # round 12 (VERDICT r11 task 3): the FULL breakdown must agree, not
    # just the headline — the used/waste split (bootstrap vs jobs,
    # end-of-cluster vs other) and the daily apportionment, computed by
    # the reference's own audit over the same mock state
    from mrjob_spark.emr_tools import clusters_to_stats

    stats = clusters_to_stats(svc.emr_client(), svc.now)

    def ref_val(label):
        m2 = re.search(re.escape(label) + r"\s+([0-9.]+)", out)
        assert m2, (label, out[-3000:])
        return float(m2.group(1))

    for label, key in (
        ("Total used:", "nih_used"),
        ("bootstrap:", "bootstrap_nih_used"),
        ("jobs:", "job_nih_used"),
        ("Total waste:", "nih_bbnu"),
        ("at end:", "end_nih_bbnu"),
        ("other:", "other_nih_bbnu"),
    ):
        assert abs(ref_val(label) - stats[key]) < 0.01, (label, stats[key])

    # daily statistics: same (date, billed, used, waste) rows. The mock
    # clock lives near the 1970 epoch, so dates are deterministic.
    ref_days = {
        m3.group(1): (float(m3.group(2)), float(m3.group(3)),
                      float(m3.group(4)))
        # the decimal-point requirement keeps the HOURLY lines (which
        # put an integer hour column right after the date) from matching
        for m3 in re.finditer(
            r"^ (\d{4}-\d{2}-\d{2}) +(\d+\.\d+) +(\d+\.\d+) +(\d+\.\d+)",
            out, re.M)
    }
    assert ref_days, out[-3000:]
    our_days = {
        d: (round(stats["date_to_nih_billed"].get(d, 0.0), 2),
            round(stats["date_to_nih_used"].get(d, 0.0), 2),
            round(stats["date_to_nih_bbnu"].get(d, 0.0), 2))
        for d in stats["date_to_nih_billed"]
    }
    assert set(ref_days) == set(our_days)
    for d in ref_days:
        for ref_v, our_v in zip(ref_days[d], our_days[d]):
            assert abs(ref_v - our_v) < 0.02, (d, ref_days[d], our_days[d])


def test_s3_tmpwatch(tmp_path):
    svc = MockEMRService(tmp_path / "emr")
    s3 = svc.s3_client()
    s3.create_bucket(Bucket="b")
    s3.put_object(Bucket="b", Key="tmp/old.txt", Body=b"x")
    s3.put_object(Bucket="b", Key="tmp/new.txt", Body=b"y")
    s3.put_object(Bucket="b", Key="keep/old.txt", Body=b"z")
    # age the old objects on disk (LastModified comes from mtime)
    old = time.time() - 10 * 86400
    for key in ("tmp/old.txt", "keep/old.txt"):
        os.utime(s3._path("b", key), (old, old))

    doomed = s3_tmpwatch(s3, "s3://b/tmp/", parse_age("7d"),
                         dry_run=True)
    assert doomed == ["tmp/old.txt"]
    assert s3.list_objects_v2(Bucket="b", Prefix="tmp/")["KeyCount"] == 2

    doomed = s3_tmpwatch(s3, "s3://b/tmp/", parse_age("7d"))
    assert doomed == ["tmp/old.txt"]
    keys = [o["Key"] for o in s3.list_objects_v2(
        Bucket="b", Prefix=""
    )["Contents"]]
    assert "tmp/old.txt" not in keys
    assert "tmp/new.txt" in keys and "keep/old.txt" in keys


def test_s3_tmpwatch_paginates_and_respects_boundary(tmp_path):
    """ADVICE r7: >1000-key tmp dirs must not leave stragglers behind
    one page, and `tmp` must not sweep a sibling `tmp-keep`."""
    import os
    import time

    svc = MockEMRService(tmp_path / "emr")
    s3 = svc.s3_client()
    s3.create_bucket(Bucket="b")
    for i in range(7):
        s3.put_object(Bucket="b", Key="tmp/f-%d" % i, Body=b"x")
    s3.put_object(Bucket="b", Key="tmp-keep/f", Body=b"x")
    old = time.time() - 10 * 86400
    for i in range(7):
        os.utime(s3._path("b", "tmp/f-%d" % i), (old, old))
    os.utime(s3._path("b", "tmp-keep/f"), (old, old))

    s3.page_size = 2  # 8 matching keys -> multiple pages
    doomed = s3_tmpwatch(s3, "s3://b/tmp", parse_age("7d"))
    assert sorted(doomed) == ["tmp/f-%d" % i for i in range(7)]
    keys = [o["Key"] for o in s3.list_objects_v2(Bucket="b")["Contents"]]
    assert keys == ["tmp-keep/f"]


# ---------------------------------------------------------------------
# normalized instance hours (VERDICT r7 task 5; reference
# mrjob/tools/emr/audit_usage.py:149-166,330-500)
# ---------------------------------------------------------------------


def _stub_cluster(created, ready=None, end=None, nih=16):
    timeline = {"CreationDateTime": created}
    if ready is not None:
        timeline["ReadyDateTime"] = ready
    if end is not None:
        timeline["EndDateTime"] = end
    return {
        "Id": "j-STUB",
        "Status": {"State": "TERMINATED" if end else "RUNNING",
                   "Timeline": timeline},
        "NormalizedInstanceHours": nih,
    }


def _stub_step(start=None, end=None):
    timeline = {}
    if start is not None:
        timeline["StartDateTime"] = start
    if end is not None:
        timeline["EndDateTime"] = end
    return {"Id": "s-STUB", "Status": {"Timeline": timeline}}


def test_cluster_nih_literal_timestamps():
    from mrjob_spark.emr_tools import cluster_nih

    # created t=0, bootstrapped by t=600, one step 600→1800, cluster
    # terminated at exactly one full hour; NIH=16 → rate 16/3600 per s.
    # used = bootstrap 600s + step 1200s = 1800s → 8.0; billed: bootstrap
    # billed until the step starts (600s), the step until cluster end
    # billing (3000s) → the whole hour → 16.0; bbnu = 8.0
    got = cluster_nih(
        _stub_cluster(0.0, ready=600.0, end=3600.0, nih=16),
        [_stub_step(start=600.0, end=1800.0)],
        now=86400.0,
    )
    assert got == {"nih_billed": 16.0, "nih_used": 8.0, "nih_bbnu": 8.0}


def test_cluster_nih_running_and_cancelled_edges():
    from mrjob_spark.emr_tools import cluster_nih

    # still-RUNNING cluster: ran=1800s → 1 full hour; step still running
    # counts used time up to `now`; billing end = created + max(ran, 60)
    got = cluster_nih(
        _stub_cluster(0.0, ready=600.0, nih=8),
        [_stub_step(start=600.0)],
        now=1800.0,
    )
    rate = 8 / 3600.0
    assert got["nih_used"] == pytest.approx(rate * 1800)
    assert got["nih_billed"] == pytest.approx(rate * 1800)
    assert got["nih_bbnu"] == pytest.approx(0.0)

    # cancelled step on a terminated cluster: credited 0 usage; a step
    # that never started ends the interval walk (reference's `break`)
    got = cluster_nih(
        _stub_cluster(0.0, ready=600.0, end=3600.0, nih=4),
        [_stub_step(start=900.0), _stub_step()],
        now=86400.0,
    )
    rate = 4 / 3600.0
    assert got["nih_used"] == pytest.approx(rate * 600)  # bootstrap only
    assert got["nih_billed"] == pytest.approx(rate * 3600)

    # no NIH / no timeline → all zeros, no crash
    assert cluster_nih({"Status": {}}, [], now=0.0) == {
        "nih_billed": 0.0, "nih_used": 0.0, "nih_bbnu": 0.0,
    }


def test_audit_usage_reports_nih_columns(tmp_path, monkeypatch, capsys):
    from mrjob_spark.emr_tools import collect_usage

    svc = MockEMRService(tmp_path / "emr")
    emr = svc.emr_client()
    emr.run_job_flow(
        Name="MRStub.user.1", Instances={
            "MasterInstanceType": "m5.xlarge",
            "SlaveInstanceType": "m5.xlarge",
            "InstanceCount": 3,
            "KeepJobFlowAliveWhenNoSteps": True,
        },
    )
    svc.sleep(1)  # STARTING → RUNNING-ish state advance
    cluster = emr.describe_cluster(
        ClusterId=list(svc.clusters)[0]
    )["Cluster"]
    # mock normalization: 3 × xlarge (8 units each) × ceil(hours)
    assert cluster["NormalizedInstanceHours"] == 24
    (row,) = collect_usage(emr, now=svc.now)
    assert row["nih_billed"] > 0
    assert row["nih_used"] >= 0
    assert row["nih_bbnu"] == pytest.approx(
        row["nih_billed"] - row["nih_used"]
    )
    # the CLI surfaces the three NIH columns and headline totals
    monkeypatch.setenv("MOCK_EMR_BASE_DIR", str(tmp_path / "emr"))
    assert umbrella_main(["mrjob", "audit-emr-usage"]) == 0
    out = capsys.readouterr().out
    for col in ("nih_bill", "nih_used", "nih_bbnu", "totals:"):
        assert col in out


def test_create_cluster_rejects_stray_positionals(tmp_path, monkeypatch):
    """A typo'd flag WITHOUT the leading dashes must be a UsageError, not
    a silently-ignored positional (round-9 ADVICE: _positionals' return
    was discarded, so `create-cluster image-id ami-123` 'worked')."""
    from mrjob_spark.emr_tools import UsageError, create_cluster_main

    with pytest.raises(UsageError, match="no positional arguments"):
        create_cluster_main(["image-id", "ami-123"])


def test_describe_base_emr_images_tool(tmp_path, monkeypatch, capsys):
    """The CLI a user runs before `create-cluster --image-id`: newest
    stable Amazon Linux base first, every rejected catalog entry
    (rc version, AL2, two volumes, undated) absent, --max truncates."""
    base = tmp_path / "emr"
    monkeypatch.setenv("MOCK_EMR_BASE_DIR", str(base))
    assert umbrella_main(["mrjob", "describe-base-emr-images"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert [ln.split()[0] for ln in lines] == ["ami-newest", "ami-older"]
    assert "Amazon Linux AMI 2018.03.0" in lines[0]

    assert umbrella_main(
        ["mrjob", "describe-base-emr-images", "--max", "1"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert [ln.split()[0] for ln in lines] == ["ami-newest"]

    # misparse hardening: stray positionals are usage errors, exit 2
    assert umbrella_main(
        ["mrjob", "describe-base-emr-images", "oops"]) == 2


def test_usage_intervals_labels_and_subdivision():
    """cluster_usage_intervals (reference audit_usage.py:256-420):
    bootstrap carries the cluster's job key, each step its own parsed
    (label, owner, step_num) — both our 3-part and the reference's
    5-part key formats — and the date/hour maps subdivide across UTC
    boundaries so a midnight-spanning step bills on both days."""
    from mrjob_spark.emr_tools import cluster_usage_intervals

    day = 86400.0
    cluster = _stub_cluster(
        day - 1800.0, ready=day - 1200.0, end=day + 1800.0, nih=16)
    cluster["Name"] = "wordcount.alice.20240101.120000.000001"
    step = _stub_step(start=day - 1200.0, end=day + 600.0)
    step["Name"] = "MRWordFreq.bob.12345: Step 2 of 3"
    ivs = cluster_usage_intervals(cluster, [step], now=10 * day)
    assert len(ivs) == 2
    boot, job = ivs
    assert (boot["label"], boot["owner"], boot["step_num"]) == (
        "wordcount", "alice", None)
    assert (job["label"], job["owner"], job["step_num"]) == (
        "MRWordFreq", "bob", 2)
    # ran exactly 1 hour → rate nih/3600; step used 1800s on both sides
    # of midnight: 1200s on day 0, 600s on day 1
    rate = 16 / 3600.0
    assert job["date_to_nih_used"] == pytest.approx({
        "1970-01-01": rate * 1200, "1970-01-02": rate * 600})
    # billed until cluster end billing (day+1800): +1200s more on day 1
    assert job["date_to_nih_billed"] == pytest.approx({
        "1970-01-01": rate * 1200, "1970-01-02": rate * 1800})
    assert job["date_to_nih_bbnu"] == pytest.approx(
        {"1970-01-02": rate * 1200})
    # hourly: step spans 23:40→00:10 used, →00:30 billed
    assert job["hour_to_nih_used"] == pytest.approx({
        "1970-01-01 23": rate * 1200, "1970-01-02 00": rate * 600})
    assert sum(job["hour_to_nih_billed"].values()) == pytest.approx(
        job["nih_billed"])


def test_clusters_to_stats_breakdowns(tmp_path):
    """clusters_to_stats (reference audit_usage.py:135-253): the label/
    owner/job-step/pool breakdowns over mock clusters driven by the
    real runner — per-label totals must reconcile with the grand total,
    the job-step table must exclude bootstrap, and the no-pool variant
    must exclude the pooled cluster's steps."""
    from mrjob_spark.emr_tools import clusters_to_stats

    svc = MockEMRService(tmp_path / "emr", tick_secs=30.0)
    inp = tmp_path / "in.txt"
    inp.write_text("apple banana apple\n")
    for pool in (False, True):
        r = EMRJobRunner(
            MRWordFreq(), input_paths=[str(inp)],
            emr_client=svc.emr_client(), s3_client=svc.s3_client(),
            check_cluster_every=0.0, pool_clusters=pool,
        )
        r.run()
        r.cleanup()
    svc.sleep(3600)
    emr = svc.emr_client()
    for cid, c in list(svc.clusters.items()):
        if not c["Status"]["State"].startswith("TERMINAT"):
            emr.terminate_job_flows(JobFlowIds=[cid])
    svc.sleep(60)

    s = clusters_to_stats(svc.emr_client(), svc.now)
    assert len(s["clusters"]) == 2
    assert s["nih_billed"] > 0
    # reconciliation: every breakdown sums to the same totals
    for nih_type in ("nih_used", "nih_billed", "nih_bbnu"):
        for family in ("label", "owner", "pool"):
            total = sum(s["%s_to_%s" % (family, nih_type)].values())
            assert total == pytest.approx(s[nih_type]), (family, nih_type)
    assert s["bootstrap_nih_used"] + s["job_nih_used"] == pytest.approx(
        s["nih_used"])
    assert s["end_nih_bbnu"] + s["other_nih_bbnu"] == pytest.approx(
        s["nih_bbnu"])
    # the runner names clusters/steps MRWordFreq.<user>.<ns> → parsed
    assert list(s["label_to_nih_used"]) == ["MRWordFreq"]
    import getpass
    assert list(s["owner_to_nih_used"]) == [getpass.getuser()]
    # job-step: bootstrap excluded, step numbers parsed, and the no-pool
    # variant holds only the un-pooled cluster's share
    assert set(s["job_step_to_nih_used"]) == {("MRWordFreq", 1)}
    assert s["job_step_to_nih_used"][("MRWordFreq", 1)] == pytest.approx(
        s["job_nih_used"])
    assert (s["job_step_to_nih_used_no_pool"][("MRWordFreq", 1)]
            < s["job_step_to_nih_used"][("MRWordFreq", 1)])
    # pools: one pooled ('default'), one not (None)
    assert set(s["pool_to_nih_billed"]) == {None, "default"}
