"""An executing mock Google Cloud Dataproc service for ``-r dataproc``.

Client shapes follow the Dataproc v1 REST resources (the public JSON
contract: ``projects.regions.clusters`` and ``projects.regions.jobs``),
as plain dicts — ``cluster['status']['state']``,
``job['driverOutputResourceUri']``, ``hadoopJob: {args,
mainJarFileUri}`` — the same field names the reference reads off its
protobuf objects (``mrjob/dataproc.py:583-771``). Like
:mod:`mockemr`, this mock EXECUTES hadoop-streaming jobs through the
:mod:`mockhadoop` engine over an on-disk object store (``gs://bucket/
key`` maps bucket-preserving), and it reproduces Dataproc's observable
artifacts:

* the job's driver log (hadoop's log4j stderr, with the indented
  ``Counters:`` block) lands as CHUNKED ``driveroutput.000000000``,
  ``driveroutput.000000001``… objects under the job's
  ``driverOutputResourceUri`` — the layout the reference's incremental
  driver-output reader walks (``mrjob/dataproc.py:802-858``);
* task/container logs become Cloud-Logging-style entries readable
  through :meth:`MockLoggingClient.list_entries` (the reference
  diagnoses failures through the logging API,
  ``mrjob/dataproc.py:869-1001``).

Lifecycle: one stage per API call on a fake clock — clusters
``CREATING → RUNNING`` (``DELETING → (gone)`` on delete; idle clusters
with a ``lifecycleConfig.idleDeleteTtl`` self-delete, Dataproc's
scheduled-deletion feature), jobs ``PENDING → SETUP_DONE → RUNNING →
DONE/ERROR``.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

from mrjob_spark.testing.mockemr import MockS3Client as MockStorageClient

_APP_ID_RE = re.compile(r"application_\d+_\d+")

#: driver output is written in chunks of this many bytes (small, so even
#: short jobs produce >1 chunk and exercise the incremental reader)
_DRIVER_OUTPUT_CHUNK = 512


class MockGoogleNotFound(Exception):
    """Stands in for google.api_core.exceptions.NotFound."""


class MockDataprocService:
    """Cluster/job state + executor. Hand the runner
    :meth:`cluster_client` / :meth:`job_client` / :meth:`logging_client`
    / :meth:`storage_client`."""

    def __init__(self, base_dir, tick_secs: float = 10.0):
        base_dir = str(base_dir)
        self.base_dir = base_dir
        self.gcs_root = os.path.join(base_dir, "gcs")
        self.storage = MockStorageClient(self.gcs_root)
        self.now = 1_000_000.0
        self.tick_secs = tick_secs
        self.clusters: dict = {}
        self.jobs: dict = {}
        self.log_entries: list = []

    # -- clients --------------------------------------------------------

    def cluster_client(self) -> "MockClusterClient":
        return MockClusterClient(self)

    def job_client(self) -> "MockJobClient":
        return MockJobClient(self)

    def logging_client(self) -> "MockLoggingClient":
        return MockLoggingClient(self)

    def storage_client(self) -> MockStorageClient:
        return self.storage

    # -- clock ------------------------------------------------------------

    def _on_call(self):
        self.now += self.tick_secs
        self._advance_all()

    def sleep(self, secs: float):
        self.now += secs
        self._advance_all()

    # -- lifecycle ---------------------------------------------------------

    def _advance_all(self):
        for name in list(self.clusters):
            self._advance_cluster(self.clusters[name])
        for job in self.jobs.values():
            self._advance_job(job)

    def _advance_cluster(self, c: dict):
        state = c["status"]["state"]
        if state == "CREATING":
            c["status"]["state"] = "RUNNING"
        elif state == "DELETING":
            self.clusters.pop(c["clusterName"], None)
        elif state == "RUNNING":
            ttl = (
                c.get("config", {}).get("lifecycleConfig", {})
                .get("idleDeleteTtl")
            )
            if ttl and self.now - c["_last_activity"] > float(
                str(ttl).rstrip("s")
            ):
                c["status"]["state"] = "DELETING"

    def _advance_job(self, job: dict):
        state = job["status"]["state"]
        cluster = self.clusters.get(
            job["placement"]["clusterName"]
        )
        if state in ("DONE", "ERROR", "CANCELLED"):
            return
        if cluster is None or cluster["status"]["state"] != "RUNNING":
            if cluster is None:
                job["status"] = {
                    "state": "ERROR",
                    "details": "cluster not found",
                }
            return  # wait for the cluster
        cluster["_last_activity"] = self.now
        if state == "PENDING":
            job["status"]["state"] = "SETUP_DONE"
        elif state == "SETUP_DONE":
            job["status"]["state"] = "RUNNING"
        elif state == "RUNNING":
            self._execute_job(job)

    # -- execution -----------------------------------------------------------

    def _execute_job(self, job: dict):
        hadoop_job = job.get("hadoopJob") or {}
        main_jar = hadoop_job.get("mainJarFileUri", "")
        args = list(hadoop_job.get("args") or [])
        if main_jar and "streaming" not in os.path.basename(main_jar) \
                or hadoop_job.get("mainClass"):
            # a custom-jar hadoopJob (the reference's 'jar' steps,
            # mrjob/dataproc.py:594-614)
            self._execute_jar_job(job, hadoop_job, args)
            return
        if "streaming" not in os.path.basename(main_jar):
            job["status"] = {
                "state": "ERROR",
                "details": "mockdataproc executes only hadoop-streaming"
                           " and custom-jar jobs, got %r" % main_jar,
            }
            return

        log_dir = tempfile.mkdtemp(prefix="mockdataproc-logs-")
        try:
            import mrjob_spark

            repo_root = os.path.dirname(os.path.dirname(
                os.path.abspath(mrjob_spark.__file__)))
            env = dict(os.environ)
            env.update({
                "MOCK_HDFS_ROOT": self.gcs_root,
                "MOCK_FS_SCHEME": "gs",
                "MOCK_HADOOP_LOG_DIR": log_dir,
                "PYTHONPATH": repo_root + os.pathsep
                + env.get("PYTHONPATH", ""),
            })
            proc = subprocess.run(
                [sys.executable, "-m", "mrjob_spark.testing.mockhadoop",
                 "jar", "hadoop-streaming.jar"] + args,
                capture_output=True, env=env,
            )
            self._write_driver_output(job, proc.stderr)
            self._collect_log_entries(job, proc.stderr, log_dir)
            if proc.returncode == 0:
                job["status"] = {"state": "DONE"}
            else:
                job["status"] = {
                    "state": "ERROR",
                    "details": "Google Cloud Dataproc Agent reports job"
                               " failure.",
                }
        finally:
            shutil.rmtree(log_dir, ignore_errors=True)

    def _map_gs_operand(self, a: str) -> str:
        """``gs://bucket/key`` (incl. comma-joined path lists) → on-disk
        store path: the mock's stand-in for the cluster-side GCS
        connector."""
        parts = []
        for part in str(a).split(","):
            if part.startswith("gs://"):
                rest = part.split("://", 1)[1]
                part = os.path.join(
                    self.gcs_root, rest.replace("/", os.sep)
                )
            parts.append(part)
        return ",".join(parts)

    def _execute_jar_job(self, job: dict, hadoop_job: dict,
                         args: list):
        """Run a custom-jar ``hadoopJob`` as a REAL java process.
        ``mainClass`` + ``jarFileUris`` → ``java -cp jar Main``;
        ``mainJarFileUri`` → ``java -jar`` (the API forbids combining
        them); gs:// operands resolve through the store like the GCS
        connector would on a real cluster."""
        main_class = hadoop_job.get("mainClass")
        if main_class:
            jar = (hadoop_job.get("jarFileUris") or [""])[0]
        else:
            jar = hadoop_job.get("mainJarFileUri", "")
        jar_path = self._map_gs_operand(jar)
        mapped = [self._map_gs_operand(a) for a in args]
        java = os.path.join(
            os.environ.get("JAVA_HOME", ""), "bin", "java"
        )
        if not os.path.exists(java):
            java = shutil.which("java") or "java"
        cmd = [java]
        if main_class:
            cmd += ["-cp", jar_path, main_class]
        else:
            cmd += ["-jar", jar_path]
        cmd += mapped
        proc = subprocess.run(cmd, capture_output=True)
        self._write_driver_output(job, proc.stderr)
        if proc.returncode == 0:
            job["status"] = {"state": "DONE"}
        else:
            job["status"] = {
                "state": "ERROR",
                "details": "Google Cloud Dataproc Agent reports job"
                           " failure.",
            }

    def _write_driver_output(self, job: dict, stderr: bytes):
        uri = job["driverOutputResourceUri"]
        bucket, key_prefix = uri.split("://", 1)[1].split("/", 1)
        for i in range(
            0, max(len(stderr), 1), _DRIVER_OUTPUT_CHUNK
        ):
            self.storage.put_object(
                Bucket=bucket,
                Key="%s.%09d" % (
                    key_prefix + "/driveroutput",
                    i // _DRIVER_OUTPUT_CHUNK,
                ),
                Body=stderr[i:i + _DRIVER_OUTPUT_CHUNK],
            )

    def _collect_log_entries(self, job: dict, stderr: bytes,
                             log_dir: str):
        """Container logs → Cloud-Logging-style entries (what the
        reference's yarn-userlogs filter retrieves)."""
        m = _APP_ID_RE.search(stderr.decode("utf-8", "replace"))
        app_id = m.group(0) if m else "application_unknown"
        userlogs = os.path.join(log_dir, "userlogs")
        if not os.path.isdir(userlogs):
            return
        for dirpath, _, names in os.walk(userlogs):
            for name in names:
                with open(os.path.join(dirpath, name),
                          errors="replace") as fh:
                    text = fh.read()
                if not text.strip():
                    continue
                self.log_entries.append({
                    "logName": "yarn-userlogs",
                    "resource": {"labels": {
                        "cluster_name": job["placement"]["clusterName"],
                    }},
                    "labels": {
                        "application": app_id,
                        "container": os.path.basename(dirpath),
                        "filename": name,
                        "job_id": job["reference"]["jobId"],
                    },
                    "textPayload": text,
                })

    # -- API ---------------------------------------------------------------

    def api_create_cluster(self, project_id: str, region: str,
                           cluster: dict) -> dict:
        cluster = json.loads(json.dumps(cluster))  # deep copy
        name = cluster["clusterName"]
        if name in self.clusters:
            raise ValueError("cluster %s already exists" % name)
        if not re.match(r"^[a-z](?:[-a-z0-9]{0,53}[a-z0-9])?$", name):
            raise ValueError("invalid clusterName %r" % name)
        cluster["projectId"] = project_id
        cluster["status"] = {"state": "CREATING"}
        cluster["_last_activity"] = self.now
        self.clusters[name] = cluster
        return {"metadata": {"clusterName": name}}

    def api_get_cluster(self, project_id: str, region: str,
                        cluster_name: str) -> dict:
        c = self.clusters.get(cluster_name)
        if c is None:
            raise MockGoogleNotFound(cluster_name)
        return {k: v for k, v in c.items() if not k.startswith("_")}

    def api_delete_cluster(self, project_id: str, region: str,
                           cluster_name: str) -> dict:
        c = self.clusters.get(cluster_name)
        if c is None:
            raise MockGoogleNotFound(cluster_name)
        c["status"]["state"] = "DELETING"
        return {}

    def api_submit_job(self, project_id: str, region: str,
                       job: dict) -> dict:
        job = json.loads(json.dumps(job))
        job_id = job["reference"]["jobId"]
        if job_id in self.jobs:
            raise ValueError("job %s already exists" % job_id)
        cluster_name = job["placement"]["clusterName"]
        if cluster_name not in self.clusters:
            raise MockGoogleNotFound(cluster_name)
        job.setdefault("projectId", project_id)
        job["status"] = {"state": "PENDING"}
        bucket = "dataproc-staging-%s" % region
        self.storage.create_bucket(Bucket=bucket)
        job["driverOutputResourceUri"] = (
            "gs://%s/google-cloud-dataproc-metainfo/jobs/%s"
            % (bucket, job_id)
        )
        self.jobs[job_id] = job
        return {k: v for k, v in job.items() if not k.startswith("_")}

    def api_get_job(self, project_id: str, region: str,
                    job_id: str) -> dict:
        job = self.jobs.get(job_id)
        if job is None:
            raise MockGoogleNotFound(job_id)
        return {k: v for k, v in job.items() if not k.startswith("_")}

    def api_cancel_job(self, project_id: str, region: str,
                       job_id: str) -> dict:
        job = self.jobs.get(job_id)
        if job is None:
            raise MockGoogleNotFound(job_id)
        if job["status"]["state"] not in ("DONE", "ERROR"):
            job["status"] = {"state": "CANCELLED"}
        return {k: v for k, v in job.items() if not k.startswith("_")}


class _ServiceClient:
    def __init__(self, service: MockDataprocService, methods: dict):
        self._svc = service
        self._methods = methods

    def __getattr__(self, name):
        api = self._methods.get(name)
        if api is None:
            raise AttributeError(name)
        method = getattr(self._svc, api)

        def call(*args, **kwargs):
            self._svc._on_call()
            return method(*args, **kwargs)

        return call


class MockClusterClient(_ServiceClient):
    def __init__(self, service):
        super().__init__(service, {
            "create_cluster": "api_create_cluster",
            "get_cluster": "api_get_cluster",
            "delete_cluster": "api_delete_cluster",
        })


class MockJobClient(_ServiceClient):
    def __init__(self, service):
        super().__init__(service, {
            "submit_job": "api_submit_job",
            "get_job": "api_get_job",
            "cancel_job": "api_cancel_job",
        })


class MockLoggingClient:
    def __init__(self, service: MockDataprocService):
        self._svc = service

    def list_entries(self, filter_: dict | None = None) -> list:
        """Entries whose ``labels`` contain every (key, value) in
        *filter_* (a dict stand-in for the logging API's filter
        expression)."""
        self._svc._on_call()
        out = []
        for entry in self._svc.log_entries:
            labels = entry.get("labels") or {}
            if filter_ and any(
                labels.get(k) != v for k, v in filter_.items()
            ):
                continue
            out.append(entry)
        return out
