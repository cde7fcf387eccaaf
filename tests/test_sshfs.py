"""SSH filesystem + mrboss + the EMR runner's SSH-first log channel,
driven end-to-end against the EXECUTING mock ssh binary
(:mod:`mrjob_spark.testing.mockssh`) and the mock EMR service.

Behavioral contract: reference ``mrjob/fs/ssh.py`` (command rendering,
chained ``master!worker`` addressing, agent discipline, sudo),
``mrjob/tools/emr/mrboss.py`` (per-node fan-out + output layout), and
``mrjob/emr.py:2040-2090`` (SSH log dirs tried before waiting on S3
delivery). The reference tests these against a fake ssh binary too
(``tests/mockssh.py``); this mock executes the remote command for real
against per-host node directories."""

import gzip
import json
import os
import sys

import pytest

from mrjob_spark.dataflow.emr import EMRJobRunner
from mrjob_spark.dataflow.job import SparkMRJob
from mrjob_spark.dataflow.sshfs import (
    CompositeFS,
    SSHFilesystem,
    parse_ssh_uri,
)
from mrjob_spark.dataflow.step import MRStep
from mrjob_spark.testing.mockemr import MockEMRService

SSH_BIN = [sys.executable, "-m", "mrjob_spark.testing.mockssh"]
SSH_ADD_BIN = SSH_BIN + ["add"]


@pytest.fixture
def net(tmp_path, monkeypatch):
    """A two-host mock network with some log files planted, plus the
    env the fake binary reads. Returns (root, env)."""
    root = tmp_path / "net"
    master = root / "master.j-X.mock"
    worker = root / "10-0-0-1.j-X.mock"
    (master / "mnt/var/log/hadoop/steps/s-1").mkdir(parents=True)
    (master / "mnt/var/log/hadoop/steps/s-1/stderr").write_text(
        "log4j stderr\n"
    )
    (worker / "mnt/var/log/hadoop-yarn/containers/app_1/c_1").mkdir(
        parents=True
    )
    (worker / "mnt/var/log/hadoop-yarn/containers/app_1/c_1"
     / "syslog").write_text("container syslog\n")
    key = tmp_path / "key.pem"
    key.write_text("FAKE KEY\n")
    import mrjob_spark

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(
        mrjob_spark.__file__)))
    env = {
        "MOCK_SSH_ROOT": str(root),
        "MOCK_SSH_CMD_LOG": str(tmp_path / "ssh_cmd.log"),
        "MOCK_SSH_REFUSE_CHAIN": "1",
        "PYTHONPATH": repo_root + os.pathsep
        + os.environ.get("PYTHONPATH", ""),
    }
    return root, str(key), env


def _fs(net, **kwargs):
    root, key, env = net
    return SSHFilesystem(
        SSH_BIN, key, ssh_add_bin=SSH_ADD_BIN, env=env, **kwargs
    )


def _cmd_log(net):
    root, key, env = net
    path = env["MOCK_SSH_CMD_LOG"]
    if not os.path.exists(path):
        return []
    return [json.loads(line) for line in open(path)]


# ---------------------------------------------------------------------
# command rendering (the wire contract, reference fs/ssh.py:68-104)
# ---------------------------------------------------------------------


def test_ssh_args_single_hop(net):
    root, key, env = net
    argv = _fs(net).ssh_args("master.j-X.mock", ["cat", "/x"])
    assert argv[:len(SSH_BIN)] == SSH_BIN
    assert argv[len(SSH_BIN):len(SSH_BIN) + 2] == ["-i", key]
    assert "hadoop@master.j-X.mock" in argv
    assert "-A" in argv
    assert ["StrictHostKeyChecking=no", "VerifyHostKeyDNS=no"] == [
        a.split("=")[0] + "=no" for a in argv
        if a.startswith(("StrictHostKeyChecking", "VerifyHostKeyDNS"))
    ]
    assert argv[-2:] == ["cat", "/x"]


def test_ssh_args_chained_hop_and_sudo(net):
    root, key, env = net
    fs = _fs(net)
    fs.use_sudo_over_ssh()
    argv = fs.ssh_args("m.mock!w.mock", ["find", "/logs"])
    # key only on the first hop; the second rides agent forwarding
    assert argv.count("-i") == 1
    assert argv.count("-A") == 2
    assert argv.index("hadoop@m.mock") < argv.index("hadoop@w.mock")
    # known-hosts: /dev/null-equivalent on hop 1, literal on hop 2
    assert "UserKnownHostsFile=/dev/null" in argv
    assert argv[-3:] == ["sudo", "find", "/logs"]


def test_parse_ssh_uri():
    assert parse_ssh_uri("ssh://a!b/c/d") == ("a!b", "/c/d")
    with pytest.raises(ValueError):
        parse_ssh_uri("s3://bucket/key")


# ---------------------------------------------------------------------
# execution against the mock network
# ---------------------------------------------------------------------


def test_ls_cat_exists_on_master(net):
    fs = _fs(net)
    uris = list(fs.ls("ssh://master.j-X.mock/mnt/var/log/hadoop/steps"))
    assert uris == [
        "ssh://master.j-X.mock/mnt/var/log/hadoop/steps/s-1/stderr"
    ]
    assert b"".join(fs.cat(uris[0])) == b"log4j stderr\n"
    assert fs.exists(uris[0])
    assert not fs.exists("ssh://master.j-X.mock/no/such/dir")


def test_gz_and_bz2_decompress_transparently(net):
    import bz2

    root, key, env = net
    gz = root / "master.j-X.mock" / "mnt/var/log/x.gz"
    gz.write_bytes(gzip.compress(b"zipped body"))
    bz = root / "master.j-X.mock" / "mnt/var/log/x.bz2"
    bz.write_bytes(bz2.compress(b"bzipped body"))
    fs = _fs(net)
    assert b"".join(fs.cat(
        "ssh://master.j-X.mock/mnt/var/log/x.gz"
    )) == b"zipped body"
    assert b"".join(fs.cat(
        "ssh://master.j-X.mock/mnt/var/log/x.bz2"
    )) == b"bzipped body"


def test_chained_hop_reaches_worker_after_ssh_add(net):
    """master!worker traverses two hops; the fake refuses the second
    (identity-less) hop unless ssh-add stored the key first — pinning
    that the fs layer really loads the agent before chained calls."""
    fs = _fs(net)
    uris = list(fs.ls(
        "ssh://master.j-X.mock!10-0-0-1.j-X.mock"
        "/mnt/var/log/hadoop-yarn/containers"
    ))
    assert uris == [
        "ssh://master.j-X.mock!10-0-0-1.j-X.mock"
        "/mnt/var/log/hadoop-yarn/containers/app_1/c_1/syslog"
    ]
    assert b"container syslog\n" in b"".join(fs.cat(uris[0]))
    log = _cmd_log(net)
    add_idx = next(i for i, e in enumerate(log) if "ssh_add" in e)
    chain_idx = next(
        i for i, e in enumerate(log)
        if e.get("host") == "10-0-0-1.j-X.mock"
    )
    assert add_idx < chain_idx


def test_abandoned_ls_generator_reaps_the_child(net, monkeypatch):
    """exists()-style short-circuits used to abandon the ls generator,
    leaving the ssh child a zombie with open pipes (round-8 ADVICE).
    Closing the generator mid-stream must reap the process."""
    import subprocess as sp

    fs = _fs(net)
    launched = []
    real_popen = sp.Popen

    def spy_popen(*args, **kwargs):
        proc = real_popen(*args, **kwargs)
        launched.append(proc)
        return proc

    monkeypatch.setattr(sp, "Popen", spy_popen)
    gen = fs.ls("ssh://master.j-X.mock/mnt/var/log")
    next(gen)  # one item, then walk away
    gen.close()
    assert len(launched) == 1
    # reaped: wait() already called, returncode populated, pipes closed
    assert launched[0].returncode is not None
    assert launched[0].stdout.closed and launched[0].stderr.closed


def test_exists_probe_is_bounded_and_reaped(net, monkeypatch):
    """exists() runs a `-print -quit` find through run() (communicate —
    fully reaped), not an abandoned streaming ls."""
    import subprocess as sp

    fs = _fs(net)
    launched = []
    real_popen = sp.Popen

    def spy_popen(argv, **kwargs):
        launched.append(argv)
        return real_popen(argv, **kwargs)

    monkeypatch.setattr(sp, "Popen", spy_popen)
    assert fs.exists("ssh://master.j-X.mock/mnt/var/log/hadoop/steps")
    assert not fs.exists("ssh://master.j-X.mock/nope")
    for argv in launched:
        assert argv[-2:] == ["-print", "-quit"]


def test_stderr_flood_does_not_deadlock_ls(net, monkeypatch):
    """A remote find writing more than a pipe buffer to stderr while
    stdout streams (permission-denied noise on a deep log tree) must not
    block the child: stderr drains on a thread (round-8 ADVICE)."""
    import subprocess as sp
    import sys as _sys

    fs = _fs(net)
    script = (
        "import sys\n"
        "sys.stderr.write('x' * 262144)\n"  # 4x a 64 KiB pipe buffer
        "sys.stderr.flush()\n"
        "for i in range(5): print('/logs/f%d' % i)\n"
    )
    monkeypatch.setattr(
        fs,
        "_launch",
        lambda address, cmd_args: sp.Popen(
            [_sys.executable, "-c", script],
            stdout=sp.PIPE,
            stderr=sp.PIPE,
        ),
    )
    uris = list(fs.ls("ssh://master.j-X.mock/logs"))
    assert uris == ["ssh://master.j-X.mock/logs/f%d" % i for i in range(5)]


def test_ls_nonzero_exit_raises_with_stderr(net):
    fs = _fs(net)
    with pytest.raises(IOError):
        list(fs.ls("ssh://master.j-X.mock/no/such/dir"))


def test_unresolvable_host_is_ioerror(net):
    fs = _fs(net)
    with pytest.raises(IOError, match="resolve"):
        fs.run("ghost.mock", ["echo", "hi"])


def test_mutators_raise(net):
    fs = _fs(net)
    for call in (
        lambda: fs.rm("ssh://master.j-X.mock/x"),
        lambda: fs.mkdir("ssh://master.j-X.mock/x"),
        lambda: fs.touchz("ssh://master.j-X.mock/x"),
        lambda: fs.du("ssh://master.j-X.mock/x"),
        lambda: fs.md5sum("ssh://master.j-X.mock/x"),
    ):
        with pytest.raises(IOError):
            call()


def test_composite_fs_routes_by_scheme(net, tmp_path):
    from mrjob_spark.dataflow.objectstore import ObjectStoreFS
    from mrjob_spark.testing.mockemr import MockS3Client

    s3 = MockS3Client(str(tmp_path / "store"))
    s3.create_bucket(Bucket="b")
    s3.put_object(Bucket="b", Key="k", Body=b"s3 body")
    fs = CompositeFS()
    fs.add_fs("ssh", _fs(net))
    fs.add_fs("s3", ObjectStoreFS(s3, scheme="s3"))
    assert fs.can_handle_path("ssh://h/p") and fs.can_handle_path("s3://b/k")
    assert b"".join(fs.cat("s3://b/k")) == b"s3 body"
    assert b"".join(fs.cat(
        "ssh://master.j-X.mock/mnt/var/log/hadoop/steps/s-1/stderr"
    )) == b"log4j stderr\n"
    with pytest.raises(IOError, match="no filesystem"):
        fs.ls("hdfs:///nope")
    # the retry facade wraps retry-capable sub-fs and keeps ssh raw
    wrapped = fs.retrying(retry_if=lambda e: False)
    assert wrapped.exists("s3://b/k")
    assert wrapped.ssh is fs.ssh


# ---------------------------------------------------------------------
# EMR runner integration: counters + diagnosis via SSH before S3
# ---------------------------------------------------------------------


class MRWordFreq(SparkMRJob):
    def steps(self):
        return [MRStep(mapper=self.m, reducer=self.r)]

    def m(self, _, line):
        for w in line.split():
            yield w.lower(), 1

    def r(self, w, counts):
        yield w, sum(counts)


class MRBoom(SparkMRJob):
    def steps(self):
        return [MRStep(mapper=self.m, reducer=self.r)]

    def m(self, _, line):
        yield "k", line

    def r(self, key, values):
        raise ValueError("exploding reducer on purpose")


def _ssh_env(svc, tmp_path):
    import mrjob_spark

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(
        mrjob_spark.__file__)))
    return {
        "MOCK_SSH_ROOT": svc.nodes_root,
        "MOCK_SSH_CMD_LOG": str(tmp_path / "emr_ssh.log"),
        "PYTHONPATH": repo_root + os.pathsep
        + os.environ.get("PYTHONPATH", ""),
    }


def _ssh_runner(svc, job, input_file, tmp_path, **kwargs):
    key = tmp_path / "emr_key.pem"
    key.write_text("FAKE KEY\n")
    return EMRJobRunner(
        job,
        input_paths=[input_file],
        emr_client=svc.emr_client(),
        s3_client=svc.s3_client(),
        check_cluster_every=0.0,
        ec2_key_pair_file=str(key),
        ssh_bin=SSH_BIN,
        ssh_add_bin=SSH_ADD_BIN,
        ssh_env=_ssh_env(svc, tmp_path),
        **kwargs,
    )


@pytest.fixture
def input_file(tmp_path):
    p = tmp_path / "in.txt"
    p.write_text("apple Banana apple\ncherry banana APPLE\n")
    return str(p)


def test_counters_via_ssh_before_s3_delivery(tmp_path, input_file):
    """With S3 log delivery lagging (real EMR: minutes), a key-pair
    runner still gets counters the moment the step ends — read off the
    master's disk over SSH. The no-SSH runner gets nothing from the
    same cluster state, proving the channel is the ssh one."""
    svc = MockEMRService(tmp_path / "emr", log_delivery_lag_secs=1e9)
    r = _ssh_runner(svc, MRWordFreq(), input_file, tmp_path)
    with r:
        got = sorted(r.cat_output())
        counters = r.counters()
    assert got[0] == ("apple", 3)
    assert counters["Map-Reduce Framework"]["Map input records"] == 2
    # the lag really withheld the S3 copy
    assert not list(r._s3_ls(r._cloud_log_dir))
    # and the bytes came through the fake ssh: sudo'd cat of the
    # master's step stderr (emr-6.9.0 >= AMI 4.3 → sudo, issue #1244)
    log = [json.loads(line)
           for line in open(_ssh_env(svc, tmp_path)["MOCK_SSH_CMD_LOG"])]
    cats = [e for e in log if e.get("cmd", [None])[0] == "cat"]
    assert any("/mnt/var/log/hadoop/steps/" in e["cmd"][1] for e in cats)
    assert all(e["sudo"] for e in cats)


def test_probable_cause_via_ssh_container_logs(tmp_path, input_file):
    """Failure diagnosis with S3 delivery lagging: the container logs
    are read off the nodes' disks — workers chained through the master
    (ssh_to_workers, reference mrjob/emr.py:1957-1976). Pooled, so the
    cluster stays WAITING after CANCEL_AND_WAIT and its nodes are still
    up to SSH into; a TERMINATE_CLUSTER failure takes the nodes with it
    and diagnosis rightly falls back to waiting on S3."""
    svc = MockEMRService(tmp_path / "emr", log_delivery_lag_secs=1e9)
    r = _ssh_runner(svc, MRBoom(), input_file, tmp_path,
                    pool_clusters=True)
    with pytest.raises(RuntimeError) as exc_info:
        r.run()
    assert "exploding reducer on purpose" in str(exc_info.value)
    r.cleanup()
    log = [json.loads(line)
           for line in open(_ssh_env(svc, tmp_path)["MOCK_SSH_CMD_LOG"])]
    hops = {e.get("host") for e in log if "host" in e}
    # at least one chained worker hop fetched container logs
    assert any(h.startswith("10-0-0-") for h in hops)


def test_no_key_pair_means_no_ssh(tmp_path, input_file):
    """Without ec2_key_pair_file the runner never tries SSH (the
    reference's gate) and falls back to S3 logs."""
    svc = MockEMRService(tmp_path / "emr")
    r = EMRJobRunner(
        MRWordFreq(), input_paths=[input_file],
        emr_client=svc.emr_client(), s3_client=svc.s3_client(),
        check_cluster_every=0.0,
    )
    with r:
        r.run()
        assert r.counters()["Map-Reduce Framework"]["Map input records"] \
            == 2
    assert not hasattr(r.fs, "ssh")


def test_ssh_tunnel_args_shape(tmp_path, input_file):
    svc = MockEMRService(tmp_path / "emr")
    r = _ssh_runner(svc, MRWordFreq(), input_file, tmp_path)
    with r:
        r.run()
        argv = r.ssh_tunnel_args(40001)
        open_argv = r.ssh_tunnel_args(40001, open_tunnel=True)
        master = r._address_of_master()
    assert argv[:len(SSH_BIN)] == SSH_BIN
    assert "-L" in argv
    fwd = argv[argv.index("-L") + 1]
    assert fwd.startswith("40001:") and fwd.endswith(":8088")
    assert argv[-1] == "hadoop@%s" % master
    for flag in ("-N", "-n", "-q"):
        assert flag in argv
    assert "ExitOnForwardFailure=yes" in argv
    assert "-g" not in argv and "-g" in open_argv and "-4" in open_argv


# ---------------------------------------------------------------------
# mrboss
# ---------------------------------------------------------------------


def test_boss_runs_on_every_node(tmp_path, input_file, monkeypatch):
    """`mrjob boss` fans the command out to the master and each core
    node (chained), storing per-node stdout/stderr in the reference's
    output layout."""
    svc = MockEMRService(tmp_path / "emr")
    r = _ssh_runner(svc, MRWordFreq(), input_file, tmp_path,
                    pool_clusters=True)
    r.run()
    cid = r.get_cluster_id()

    env = _ssh_env(svc, tmp_path)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    monkeypatch.setenv("MOCK_EMR_BASE_DIR", str(tmp_path / "emr"))
    from mrjob_spark.emr_tools import boss_main

    out_dir = tmp_path / "boss_out"
    key = tmp_path / "emr_key.pem"
    rc = boss_main([
        "--ec2-key-pair-file", str(key),
        "--ssh-bin", " ".join(SSH_BIN),
        "--ssh-add-bin", " ".join(SSH_ADD_BIN),
        "-o", str(out_dir),
        cid, "echo hello-from-node",
    ])
    assert rc == 0
    master_out = (out_dir / "master" / "stdout").read_bytes()
    assert master_out == b"hello-from-node\n"
    worker_dirs = [d for d in os.listdir(out_dir) if d.startswith("worker ")]
    assert len(worker_dirs) == 2  # default num_core_instances
    for d in worker_dirs:
        assert (out_dir / d / "stdout").read_bytes() \
            == b"hello-from-node\n"
    r.cleanup()


def test_boss_usage_error():
    from mrjob_spark.emr_tools import boss_main

    assert boss_main(["j-123", "echo hi"]) == 2  # no key file


def test_boss_malformed_flags_are_usage_errors(capsys):
    """Round-8 ADVICE: a trailing flag with no value raised IndexError,
    and an unrecognized `--typo value` left `value` in the positionals
    where it was silently misparsed as the cluster id. Both must be
    explicit usage errors now (exit 2 via the umbrella dispatcher)."""
    from mrjob_spark.cmd import main as umbrella_main
    from mrjob_spark.emr_tools import UsageError, boss_main

    # trailing flag, no value
    with pytest.raises(UsageError, match="requires a value"):
        boss_main(["j-123", "echo hi", "--ec2-key-pair-file"])
    # unknown flag taking a value must not shift the positionals
    with pytest.raises(UsageError, match="unrecognized"):
        boss_main(
            ["--ec2-key-pair-file", "k.pem", "--typo", "oops",
             "j-123", "echo hi"]
        )
    # the umbrella command turns both into exit code 2, not a traceback
    rc = umbrella_main(
        ["mrjob", "boss", "j-123", "echo hi", "--ec2-key-pair-file"])
    assert rc == 2
    assert "requires a value" in capsys.readouterr().err


def test_emr_ssh_tunnel_lifecycle(tmp_path, input_file):
    """make_ssh_tunnel drives the full reference lifecycle against the
    mock cluster: the rendered argv targets hadoop@master with the
    seeded bind port, set_up launches and reports the URL, kill reaps."""
    svc = MockEMRService(tmp_path / "emr")
    # a stand-in ssh that holds the "tunnel" open (extra argv ignored)
    hold_open = [sys.executable, "-c", "import time; time.sleep(30)"]
    r = _ssh_runner(svc, MRWordFreq(), input_file, tmp_path)
    with r:
        r.run()
        r._ssh_bin = hold_open
        t = r.make_ssh_tunnel(launch_wait_secs=0.05)
        ports = t.pick_bind_ports()
        # deterministic per cluster id: a second runner poll would reuse
        # the same local port (reference issue #67)
        assert ports == r.make_ssh_tunnel().pick_bind_ports()
        argv = r.ssh_tunnel_args(ports[0])
        assert argv[-1] == "hadoop@%s" % r._address_of_master()
        try:
            assert t.set_up() is True
            assert t.url == "http://localhost:%d/cluster" % ports[0]
        finally:
            t.kill()
        assert t.url is None


def test_dataproc_ssh_tunnel_args_shape(tmp_path, input_file):
    """The Dataproc twin rides gcloud compute ssh: tunnel opts after the
    `--` separator, master named <cluster>-m, zone from the cluster's
    gceClusterConfig (reference mrjob/dataproc.py:1285-1300)."""
    from mrjob_spark.dataflow.dataproc import DataprocJobRunner
    from mrjob_spark.testing.mockdataproc import MockDataprocService

    svc = MockDataprocService(tmp_path / "dp")
    r = DataprocJobRunner(
        MRWordFreq(), input_paths=[input_file],
        cluster_client=svc.cluster_client(), job_client=svc.job_client(),
        storage_client=svc.storage_client(),
        logging_client=svc.logging_client(),
        check_cluster_every=0.0,
    )
    with r:
        r.run()
        argv = r.ssh_tunnel_args(40001)
        open_argv = r.ssh_tunnel_args(40001, open_tunnel=True)
        master = "%s-m" % r.get_cluster_id()
    assert argv[:3] == ["gcloud", "compute", "ssh"]
    sep = argv.index("--")
    assert argv[sep - 1] == master
    assert "--zone" in argv[:sep]
    zone = argv[argv.index("--zone") + 1]
    assert zone.endswith("-a")
    tail = argv[sep + 1:]
    assert tail[tail.index("-L") + 1] == "40001:%s:8088" % master
    for flag in ("-N", "-n", "-q"):
        assert flag in tail
    assert "-g" not in tail
    open_tail = open_argv[open_argv.index("--") + 1:]
    assert "-g" in open_tail and "-4" in open_tail


def test_dataproc_tunnel_defaults_and_auto_zone(tmp_path, input_file):
    """ADVICE r10: (a) cluster creation must NOT pin gceClusterConfig
    .zoneUri to '<region>-a' — Dataproc auto-places the zone and the pin
    fails outright where zone a is unavailable (ssh_tunnel_args already
    falls back for an empty zoneUri); (b) make_ssh_tunnel defaults its
    grace period to the reference's min(20, check_cluster_every)
    (mrjob/dataproc.py:1281-1284) and feeds the empty-passphrase payload
    b'\\n\\n' so a first-ever gcloud ssh can't block at the key prompt."""
    from mrjob_spark.dataflow.dataproc import DataprocJobRunner
    from mrjob_spark.testing.mockdataproc import MockDataprocService

    svc = MockDataprocService(tmp_path / "dp")
    r = DataprocJobRunner(
        MRWordFreq(), input_paths=[input_file],
        cluster_client=svc.cluster_client(), job_client=svc.job_client(),
        storage_client=svc.storage_client(),
        logging_client=svc.logging_client(),
        check_cluster_every=7.5,
    )
    kwargs = r._cluster_create_kwargs()
    assert "zoneUri" not in kwargs["config"].get("gceClusterConfig", {}), (
        "cluster creation must leave zone placement to Dataproc"
    )
    r._cluster_name = "mrjob-test-abc123"
    t = r.make_ssh_tunnel()
    assert t._launch_wait_secs == 7.5          # min(20, 7.5)
    assert t._stdin_payload == b"\n\n"
    r.check_cluster_every = 60.0
    assert r.make_ssh_tunnel()._launch_wait_secs == 20.0  # min(20, 60)
    # an explicit value still wins (the tests' fast path)
    assert r.make_ssh_tunnel(launch_wait_secs=0.05)._launch_wait_secs == 0.05


def test_emr_runner_keeps_tunnel_alive_during_polls(
        tmp_path, input_file, monkeypatch):
    """With ssh_tunnel=True the runner opens the web-UI tunnel during
    step polling (the reference calls _set_up_ssh_tunnel on every
    cluster poll) and kills it at cleanup."""
    svc = MockEMRService(tmp_path / "emr")
    r = _ssh_runner(svc, MRWordFreq(), input_file, tmp_path,
                    ssh_tunnel=True)
    # stub ONLY the tunnel argv (a process that holds the "tunnel"
    # open); the sshfs log-fetch channel keeps the real mock ssh
    monkeypatch.setattr(
        EMRJobRunner, "ssh_tunnel_args",
        lambda self, port, open_tunnel=False:
            [sys.executable, "-c", "import time; time.sleep(600)"],
    )
    with r:
        r.run()
        assert r.ssh_tunnel_url is not None
        assert r.ssh_tunnel_url.startswith("http://localhost:")
        assert r.ssh_tunnel_url.endswith("/cluster")
        proc = r._ssh_tunnel._proc
        assert proc is not None and proc.poll() is None
    # context exit runs cleanup: tunnel process reaped
    assert r.ssh_tunnel_url is None
    assert proc.poll() is not None
