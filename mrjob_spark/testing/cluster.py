"""A throwaway mock Hadoop 'cluster' for ``-r hadoop`` tests and queries.

Wraps the directory layout + environment the executing mock binary
(:mod:`mrjob_spark.testing.mockhadoop`) needs: an HDFS root, a YARN-style
log dir, a planted streaming jar under a fake ``HADOOP_HOME``, and the
``PYTHONPATH`` that lets the mock subprocess import this package from any
cwd. The reference wraps the same state in its mock-cluster test case
(``tests/mockhadoop.py:58-95``); here it is a shipped class so registry
queries can stand up a cluster too.
"""

from __future__ import annotations

import json
import os
import sys


class MockHadoopCluster:
    """``MockHadoopCluster(dir)`` lays out the cluster under *dir*;
    :meth:`runner` builds a :class:`HadoopJobRunner` wired to it."""

    def __init__(self, base_dir):
        base_dir = str(base_dir)
        self.root = os.path.join(base_dir, "hdfs")
        self.logs = os.path.join(base_dir, "logs")
        self.home = os.path.join(base_dir, "hadoop-home")
        jar_dir = os.path.join(
            self.home, "share", "hadoop", "tools", "lib"
        )
        for d in (self.root, self.logs, jar_dir):
            os.makedirs(d, exist_ok=True)
        self.jar = os.path.join(jar_dir, "hadoop-streaming-3.3.6.jar")
        open(self.jar, "wb").close()
        self.hadoop_bin = [
            sys.executable, "-m", "mrjob_spark.testing.mockhadoop"
        ]
        self.cmd_log_path = os.path.join(base_dir, "cmd.log")
        import mrjob_spark

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(
            mrjob_spark.__file__)))
        self.env = {
            "MOCK_HDFS_ROOT": self.root,
            "MOCK_HADOOP_LOG_DIR": self.logs,
            "MOCK_HADOOP_CMD_LOG": self.cmd_log_path,
            "PYTHONPATH": repo_root + os.pathsep
            + os.environ.get("PYTHONPATH", ""),
        }

    def runner(self, job, **kwargs):
        from mrjob_spark.dataflow.hadoop import HadoopJobRunner

        kwargs.setdefault("hadoop_bin", self.hadoop_bin)
        kwargs.setdefault("hadoop_streaming_jar", self.jar)
        kwargs.setdefault("env", self.env)
        return HadoopJobRunner(job, **kwargs)

    def fs(self):
        from mrjob_spark.dataflow.hdfs import HadoopClientFS

        return HadoopClientFS(self.hadoop_bin, env=self.env)

    def jar_argvs(self) -> list[list[str]]:
        """Every ``hadoop jar`` argv the mock recorded (command-
        construction assertions, the reference's
        ``get_mock_hadoop_cmd_args`` idea)."""
        out = []
        if os.path.exists(self.cmd_log_path):
            with open(self.cmd_log_path) as fh:
                for line in fh:
                    argv = json.loads(line)
                    if argv and argv[0] == "jar":
                        out.append(argv)
        return out
