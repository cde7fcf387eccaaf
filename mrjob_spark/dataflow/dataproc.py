"""``-r dataproc``: run a :class:`SparkMRJob` on Google Cloud Dataproc —
the reference's ``DataprocJobRunner`` re-expressed for this engine
(``mrjob/dataproc.py`` is the behavioral contract; nothing is translated
from it).

Where EMR submits *steps to a cluster*, Dataproc has a first-class JOBS
API: each :class:`~mrjob_spark.dataflow.step.MRStep` becomes one
``hadoopJob`` (``{args, mainJarFileUri}`` against the cluster's own
streaming jar) submitted to ``projects.regions.jobs`` and polled through
``PENDING → SETUP_DONE → RUNNING → DONE/ERROR`` (the reference's state
loop, ``mrjob/dataproc.py:718-771``). Args come from the SAME
:class:`~mrjob_spark.dataflow.hadoop.StreamingStepRenderer` as
``-r hadoop`` / ``-r emr``, so task commands and wire protocols are
identical across all six runners.

The driver log is not a subprocess stderr here — Dataproc streams it to
GCS as chunked ``driveroutput.000000000``, ``driveroutput.000000001``…
objects under the job's ``driverOutputResourceUri``. This runner reads
those chunks INCREMENTALLY while polling (the reference's
``_get_new_driver_output_lines`` reader, ``mrjob/dataproc.py:802-858``),
logs progress lines as they appear, and parses the final ``Counters:``
block with the shared interpreter. Failures are diagnosed from the
driver output first, then from Cloud-Logging ``yarn-userlogs`` entries
(the reference's logging-API walk, ``mrjob/dataproc.py:869-1001``),
through the shared task-log pattern library.

Clients are duck-typed on the Dataproc v1 REST resource shapes (plain
dicts — the public JSON contract). Inject them
(:class:`mrjob_spark.testing.mockdataproc.MockDataprocService` in
tests); the google-cloud client libraries are absent in this
environment, so construction without injected clients raises a clear
ImportError (same policy as the protobuf-gated streaming API).

Clusters: created on demand (name ``mrjob-<region>-<suffix>``, the
reference's naming), or joined when ``cluster_name`` names an existing
one — the reference's get-then-create dance
(``mrjob/dataproc.py:622-652``). Idle clusters self-delete through
Dataproc's scheduled-deletion ``lifecycleConfig.idleDeleteTtl`` (the
API-native form of the reference's ``max_mins_idle`` bootstrap script).
There is NO pooling here — the reference pools only on EMR.

Scale note: intermediates stay on the cloud store end to end and the
driver moves only command lines, driver-log chunks, and counters. (The
reference defaults step intermediates to ``hdfs:///`` on the cluster;
with injected object-store clients this runner keeps them on GCS so
every artifact is observable — on a real deployment pass
``step_output_dir='hdfs:///tmp/...'`` to get the reference's layout.)
"""

from __future__ import annotations

import getpass
import os
import posixpath
import re
import sys
import tempfile
import time
from typing import Iterator, Optional

from mrjob_spark.dataflow.hadoop import (
    StreamingStepRenderer,
    _zip_package,
    interpret_driver_stderr,
)
from mrjob_spark.dataflow.objectstore import iter_objects, key_within

#: where Dataproc images keep the streaming jar (the reference's
#: _HADOOP_STREAMING_JAR_URI, mrjob/dataproc.py:96-99)
_HADOOP_STREAMING_JAR_URI = (
    "file:///usr/lib/hadoop-mapreduce/hadoop-streaming.jar"
)

_JOB_STATE_ACTIVE = ("PENDING", "SETUP_DONE", "RUNNING", "CANCEL_PENDING")


def _cleanse_gcp_job_id(job_key: str) -> str:
    """GCP job ids allow [a-zA-Z0-9_-] only (the reference's
    ``_cleanse_gcp_job_id``, ``mrjob/dataproc.py:176-178``)."""
    return re.sub(r"[^a-zA-Z0-9_\-]", "-", job_key)


def _parse_gs_uri(uri: str) -> tuple:
    if not str(uri).startswith("gs://"):
        raise ValueError("not a GCS URI: %r" % uri)
    rest = str(uri).split("://", 1)[1]
    bucket, _, key = rest.partition("/")
    return bucket, key


class DataprocException(Exception):
    """Cluster entered ERROR/DELETING while we needed it."""


class _DriverOutputReader:
    """Incremental reader over the chunked ``driveroutput.*`` objects:
    remembers (chunk index, byte offset) and returns only NEW complete
    lines each poll — the reference's reader contract
    (``mrjob/dataproc.py:802-858``)."""

    def __init__(self, storage_client, uri: str):
        self._storage = storage_client
        self._bucket, self._prefix = _parse_gs_uri(uri)
        self._chunk = 0
        self._offset = 0
        self._partial = b""
        self.text = ""  # everything read so far, for counter parsing

    def new_lines(self) -> list:
        out: list = []
        while True:
            key = "%s/driveroutput.%09d" % (self._prefix, self._chunk)
            try:
                body = self._storage.get_object(
                    Bucket=self._bucket, Key=key
                )["Body"].read()
            except Exception:
                break
            data = body[self._offset:]
            if not data:
                # a later chunk existing means this one is final-sized
                probe = "%s/driveroutput.%09d" % (
                    self._prefix, self._chunk + 1
                )
                try:
                    self._storage.get_object(
                        Bucket=self._bucket, Key=probe
                    )
                except Exception:
                    break
                self._chunk += 1
                self._offset = 0
                continue
            self._offset += len(data)
            buf = self._partial + data
            lines = buf.split(b"\n")
            self._partial = lines.pop()
            for ln in lines:
                text = ln.decode("utf-8", "replace")
                self.text += text + "\n"
                out.append(text)
        return out

    def flush(self) -> None:
        if self._partial:
            self.text += self._partial.decode("utf-8", "replace") + "\n"
            self._partial = b""


class DataprocJobRunner(StreamingStepRenderer):
    """Dataproc runner with the same surface as the other five
    (``run`` / ``cat_output`` / ``counters`` / context manager).

    :param cluster_client / job_client / storage_client /
        logging_client: duck-typed v1-REST-shaped clients (REQUIRED in
        this environment — see module docstring).
    :param project_id / region: addressing for every API call.
    :param cluster_name: join this cluster if it exists, create it
        otherwise (default: a fresh ``mrjob-<region>-<suffix>`` name).
    :param max_mins_idle: scheduled-deletion idle TTL for clusters this
        runner creates.
    :param check_cluster_every: real seconds between polls (tests ~0).
    """

    alias = "dataproc"

    def __init__(
        self,
        job,
        input_paths: Optional[list] = None,
        output_dir: Optional[str] = None,
        cluster_client=None,
        job_client=None,
        storage_client=None,
        logging_client=None,
        project_id: str = "mock-project",
        region: str = "us-central1",
        cluster_name: Optional[str] = None,
        image_version: str = "2.1",
        instance_type: str = "n1-standard-1",
        num_core_instances: int = 2,
        cloud_tmp_dir: Optional[str] = None,
        max_mins_idle: float = 10.0,
        check_cluster_every: float = 10.0,
        leave_cluster_running: bool = False,
        num_reducers: Optional[int] = None,
        jobconf: Optional[dict] = None,
        conf_jobconf: Optional[dict] = None,
        cmdenv: Optional[dict] = None,
        setup: Optional[list] = None,
        libjars: Optional[list] = None,
        hadoop_extra_args: Optional[list] = None,
        python_bin: Optional[list] = None,
        bootstrap_sys_path: bool = True,
        cloud_api_backoff: Optional[float] = None,
        cloud_part_size_mb: Optional[float] = 100.0,
        **_ignored,
    ):
        if not (cluster_client and job_client and storage_client):
            raise ImportError(
                "-r dataproc needs injected cluster/job/storage clients in"
                " this environment (google-cloud-dataproc isn't installed;"
                " see mrjob_spark.testing.mockdataproc.MockDataprocService)"
            )
        from mrjob_spark.dataflow.cloudretry import wrap_cloud_client

        self.job = job
        self.input_paths = list(input_paths or [])
        # control-plane calls retry on throttles/transient faults (429
        # = rateLimitExceeded is steady-state at fleet concurrency)
        self._clusters = wrap_cloud_client(
            cluster_client, backoff=cloud_api_backoff
        )
        self._jobs = wrap_cloud_client(job_client,
                                       backoff=cloud_api_backoff)
        self._storage = wrap_cloud_client(storage_client,
                                          backoff=cloud_api_backoff)
        self._logging = logging_client and wrap_cloud_client(
            logging_client, backoff=cloud_api_backoff
        )
        self._project_id = project_id
        self._region = region
        self._image_version = image_version
        self._instance_type = instance_type
        self._num_core_instances = num_core_instances
        self._max_mins_idle = max_mins_idle
        self._cloud_part_size_mb = cloud_part_size_mb
        self.check_cluster_every = check_cluster_every
        self._leave_cluster_running = leave_cluster_running
        self._libjars = list(libjars or [])
        self._hadoop_extra_args = list(hadoop_extra_args or [])
        # tasks run on Dataproc nodes, not the driver machine — default
        # to 'python3' like the reference's non-local runners
        # (mrjob/bin.py:191-205), never sys.executable's absolute path
        self._python_bin = list(python_bin or ["python3"])
        self._bootstrap_sys_path = bootstrap_sys_path

        merged = dict(conf_jobconf or {})
        merged.update(job.JOBCONF)
        for step in job.steps():
            merged.update(getattr(step, "jobconf", {}) or {})
        merged.update(jobconf or {})
        self._jobconf = {k: str(v) for k, v in merged.items()}
        if num_reducers is None:
            # variant-tolerant read (dataflow/compat.py): a job written
            # for Hadoop 1 sets mapred.reduce.tasks and still works
            from mrjob_spark.dataflow.compat import jobconf_from_dict

            jr = jobconf_from_dict(merged, "mapreduce.job.reduces")
            if jr is not None:
                num_reducers = int(jr)
        self.num_reducers = num_reducers
        self._cmdenv = dict(cmdenv or {})
        self._setup = list(setup or [])

        user = getpass.getuser()
        self._job_key = "%s.%s.%d" % (
            type(job).__name__, user, time.time_ns()
        )
        self._cluster_name = cluster_name
        self._created_cluster = False

        tmp = cloud_tmp_dir or "gs://mrjob-spark-tmp/"
        if not tmp.endswith("/"):
            tmp += "/"
        self._cloud_tmp_dir = tmp
        self._job_tmp = tmp + "tmp/" + self._job_key + "/"
        self._files_uri = self._job_tmp + "files/"
        self.output_dir = output_dir or self._job_tmp + "output/"
        self._explicit_output = output_dir is not None

        self._scratch: Optional[str] = None
        self._job_ids: list = []
        self._counters_per_step: list = []
        self._log_interpretations: list = []
        self._uploaded_uris: dict = {}
        self._ran = False

    @property
    def fs(self):
        """Driver-side GCS filesystem (the reference's ``runner.fs``
        surface, ``mrjob/fs/gcs.py``) over the same storage client the
        runner uses."""
        from mrjob_spark.dataflow.objectstore import ObjectStoreFS

        return ObjectStoreFS(self._storage, scheme="gs")

    # --- GCS helpers ------------------------------------------------------

    def _ensure_bucket(self, bucket: str) -> None:
        try:
            self._storage.head_bucket(Bucket=bucket)
        except Exception:
            self._storage.create_bucket(Bucket=bucket)

    def _gs_ls(self, prefix_uri: str) -> Iterator[str]:
        bucket, prefix = _parse_gs_uri(prefix_uri)
        for obj in iter_objects(self._storage, bucket, prefix):
            if key_within(obj["Key"], prefix):
                yield "gs://%s/%s" % (bucket, obj["Key"])

    def _gs_read(self, uri: str) -> bytes:
        bucket, key = _parse_gs_uri(uri)
        return self._storage.get_object(
            Bucket=bucket, Key=key
        )["Body"].read()

    def _gs_rm_prefix(self, prefix_uri: str) -> None:
        bucket, prefix = _parse_gs_uri(prefix_uri)
        doomed = [
            obj["Key"]
            for obj in iter_objects(self._storage, bucket, prefix)
            if key_within(obj["Key"], prefix)
        ]
        for key in doomed:
            self._storage.delete_object(Bucket=bucket, Key=key)

    # --- uploads (same set as -r hadoop / -r emr) --------------------------

    def _get_scratch(self) -> str:
        if self._scratch is None:
            self._scratch = tempfile.mkdtemp(prefix="mrjob-spark-dataproc-")
        return self._scratch

    def _upload(self, local_path: str, name: str | None = None) -> str:
        local_path = os.path.abspath(local_path)
        if local_path in self._uploaded_uris:
            return self._uploaded_uris[local_path]
        name = name or os.path.basename(local_path)
        uri = self._files_uri + name
        bucket, key = _parse_gs_uri(uri)
        self._storage.upload_file(
            Filename=local_path, Bucket=bucket, Key=key,
            Config=self._transfer_config(),
        )
        self._uploaded_uris[local_path] = uri
        return uri

    def _upload_part_size(self) -> Optional[int]:
        """Multipart part size in bytes from ``cloud_part_size_mb`` —
        the reference sizes its GCS filesystem uploads with the same
        option (mrjob/dataproc.py:418, mrjob/runner.py:1263-1267)."""
        if self._cloud_part_size_mb:
            return int(self._cloud_part_size_mb * 1024 * 1024)
        return None

    def _transfer_config(self):
        """Same chunk-size/threshold TransferConfig the EMR twin builds
        (emr.py:_s3_put_file), huge-sentinel disable path included — a
        boto3-compatible storage client requires a TransferConfig object
        for ``Config=``, not a raw int (ADVICE r11)."""
        part_size = self._upload_part_size() or 2 ** 256
        try:
            from boto3.s3.transfer import TransferConfig

            return TransferConfig(
                multipart_chunksize=part_size,
                multipart_threshold=part_size,
            )
        except ImportError:  # mock-only environments without boto3
            return None

    def _prepare_uploads(self) -> tuple:
        import pyspark.cloudpickle as cloudpickle

        self._ensure_bucket(_parse_gs_uri(self._cloud_tmp_dir)[0])
        scratch = self._get_scratch()

        job_pkl = os.path.join(scratch, "job.pkl")
        with open(job_pkl, "wb") as fh:
            fh.write(cloudpickle.dumps(self.job))

        files = [
            self._upload(job_pkl) + "#job.pkl",
            self._upload(_zip_package(scratch)) + "#mrjob_spark.zip",
        ]
        for entry in list(self.job.FILES) + list(
            getattr(self.job, "DIRS", []) or []
        ):
            path, _, alias = str(entry).partition("#")
            name = alias or os.path.basename(path.rstrip("/"))
            files.append(self._upload(path) + "#" + name)

        archives = []
        for entry in list(getattr(self.job, "ARCHIVES", []) or []):
            path, _, alias = str(entry).partition("#")
            name = alias or os.path.basename(path)
            archives.append(self._upload(path) + "#" + name)

        inputs = []
        for i, p in enumerate(self.input_paths):
            if "://" in p:
                inputs.append(p)
            else:
                import glob as globmod

                matches = sorted(globmod.glob(p)) or [p]
                for j, m in enumerate(matches):
                    inputs.append(self._upload(
                        m, "input-%05d-%05d-%s" % (i, j, os.path.basename(m))
                    ))
        if not inputs:
            raise ValueError("no input: pass input_paths")
        return files, archives, inputs

    # --- cluster ------------------------------------------------------------

    def _cluster_create_kwargs(self) -> dict:
        return {
            "clusterName": self._cluster_name,
            "config": {
                "softwareConfig": {
                    "imageVersion": self._image_version,
                },
                "masterConfig": {
                    "numInstances": 1,
                    "machineTypeUri": self._instance_type,
                },
                "workerConfig": {
                    "numInstances": self._num_core_instances,
                    "machineTypeUri": self._instance_type,
                },
                "lifecycleConfig": {
                    "idleDeleteTtl": "%ds" % int(self._max_mins_idle * 60),
                },
                # no gceClusterConfig.zoneUri: Dataproc auto-places the
                # zone (the reference relies on this — pinning "<region>-a"
                # fails outright in regions where zone a is unavailable or
                # out of capacity). ssh_tunnel_args reads the zone back
                # from the LIVE cluster, falling back to "<region>-a" only
                # when the service reports none (mock clusters).
            },
        }

    def _launch_cluster(self) -> None:
        if not self._cluster_name:
            # the reference's naming: mrjob-<region>-<random>; ours uses
            # the job key's timestamp so ids stay deterministic per run
            suffix = _cleanse_gcp_job_id(
                self._job_key.rsplit(".", 1)[-1]
            ).lower()
            self._cluster_name = "mrjob-%s-%s" % (
                self._region.lower(), suffix
            )
        try:
            self._clusters.get_cluster(
                self._project_id, self._region, self._cluster_name
            )
            return  # join an existing cluster (mrjob/dataproc.py:633-636)
        except Exception:
            pass
        self._clusters.create_cluster(
            self._project_id, self._region, self._cluster_create_kwargs()
        )
        self._created_cluster = True
        self._wait_for_cluster_ready()

    def _wait_for_cluster_ready(self) -> None:
        while True:
            cluster = self._clusters.get_cluster(
                self._project_id, self._region, self._cluster_name
            )
            state = cluster["status"]["state"]
            if state in ("RUNNING", "UPDATING"):
                return
            if state in ("ERROR", "DELETING"):
                raise DataprocException(
                    "cluster %s is %s" % (self._cluster_name, state)
                )
            if self.check_cluster_every:
                time.sleep(self.check_cluster_every)

    # --- execution ------------------------------------------------------------

    def _jar_step_hadoop_job(self, step, inputs: list,
                             output_uri: str) -> dict:
        """The reference's ``_jar_step_job_kwarg`` shape
        (``mrjob/dataproc.py:594-614``): a ``hadoopJob`` running the
        user's jar, with INPUT/OUTPUT interpolated to GCS URIs and
        GENERIC_ARGS to the ``-D`` property list. The API can't take
        ``mainClass`` and ``mainJarFileUri`` together, so a main class
        rides ``jarFileUris`` instead."""
        from mrjob_spark.dataflow.step import GENERIC_ARGS, INPUT, OUTPUT

        in_arg = ",".join(inputs)
        props = ["-D%s=%s" % (k, v)
                 for k, v in sorted(step.jobconf.items())]
        args: list = []
        for a in step.args:
            if a == GENERIC_ARGS:
                args.extend(props)
            else:
                args.append(
                    str(a).replace(INPUT, in_arg).replace(OUTPUT,
                                                          output_uri)
                )
        jar = step.jar
        if "://" not in jar:
            jar = self._upload(jar)
        hadoop_job: dict = {"args": args}
        if step.main_class:
            hadoop_job["jarFileUris"] = [jar]
            hadoop_job["mainClass"] = step.main_class
        else:
            hadoop_job["mainJarFileUri"] = jar
        return hadoop_job

    def run(self) -> "DataprocJobRunner":
        from mrjob_spark.dataflow.step import JarStep, MRStep

        if self._ran:
            return self
        steps = self.job.steps()
        for step in steps:
            if not isinstance(step, (MRStep, JarStep)):
                raise NotImplementedError(
                    "-r dataproc runs streaming (MRStep) and jar"
                    " (JarStep) steps; %r needs the Spark runner"
                    % type(step).__name__
                )
            if getattr(step, "mapper_raw", None):
                raise NotImplementedError(
                    "mapper_raw under -r dataproc needs the input-manifest"
                    " machinery; use -r inline/local/spark"
                )

        files, archives, inputs = self._prepare_uploads()
        self._launch_cluster()

        prefix = _cleanse_gcp_job_id(self._job_key)
        for step_num, step in enumerate(steps):
            last = step_num == len(steps) - 1
            output_uri = (
                self.output_dir if last
                else self._job_tmp + "step-output/%04d/" % step_num
            )
            if isinstance(step, MRStep):
                hadoop_job = {
                    "args": self._streaming_step_body(
                        step, step_num, files, archives, inputs,
                        output_uri.rstrip("/"),
                    ),
                    "mainJarFileUri": _HADOOP_STREAMING_JAR_URI,
                }
            else:
                hadoop_job = self._jar_step_hadoop_job(
                    step, inputs, output_uri.rstrip("/")
                )
            job_id = "%s---step-%05d-of-%05d" % (
                prefix, step_num + 1, len(steps)
            )
            self._jobs.submit_job(
                self._project_id, self._region, {
                    "reference": {"jobId": job_id},
                    "placement": {"clusterName": self._cluster_name},
                    "hadoopJob": hadoop_job,
                },
            )
            self._job_ids.append(job_id)
            self._wait_for_job(job_id, step_num, len(steps))
            inputs = [output_uri.rstrip("/")]
        self._ran = True
        return self

    def _wait_for_job(self, job_id: str, step_num: int,
                      num_steps: int) -> None:
        reader: Optional[_DriverOutputReader] = None
        while True:
            job = self._jobs.get_job(
                self._project_id, self._region, job_id
            )
            state = job["status"]["state"]

            if reader is None and job.get("driverOutputResourceUri"):
                reader = _DriverOutputReader(
                    self._storage, job["driverOutputResourceUri"]
                )
            if reader is not None:
                # stream NEW driver-log lines as they land on GCS (the
                # reference logs progress lines the same way)
                reader.new_lines()

            if state in _JOB_STATE_ACTIVE:
                if self.check_cluster_every:
                    time.sleep(self.check_cluster_every)
                continue

            interp: dict = {"job_id": job_id}
            if reader is not None:
                reader.flush()
                interp.update(interpret_driver_stderr(reader.text))
            self._log_interpretations.append(interp)

            if state == "DONE":
                self._counters_per_step.append(interp.get("counters", {}))
                return

            # ERROR / CANCELLED
            cause, excerpt = self._probable_cause(
                job_id, reader.text if reader else ""
            )
            msg = "step %d of %d %s (Dataproc job %s)" % (
                step_num + 1, num_steps, state, job_id
            )
            details = job["status"].get("details")
            if details:
                msg += "\n" + details
            if cause:
                msg += "\nProbable cause of failure:\n" + cause
            if excerpt:
                msg += "\n--- task log excerpt ---\n" + excerpt
            raise RuntimeError(msg)

    def _probable_cause(self, job_id: str, driver_text: str) -> tuple:
        """Driver output first, then Cloud-Logging yarn-userlogs entries
        (the reference's two-source diagnosis,
        ``mrjob/dataproc.py:781-1001``), through the shared pattern
        library."""
        from mrjob_spark.dataflow.errors import extract_probable_cause

        texts = []
        if self._logging is not None:
            for entry in self._logging.list_entries(
                filter_={"job_id": job_id}
            ):
                payload = entry.get("textPayload", "")
                if payload:
                    texts.append(payload)
        if driver_text:
            texts.append(driver_text)
        if not texts:
            return None, None
        # one joined scan so the pattern library's own precedence rules
        # (an embedded Python traceback beats the generic
        # PipeMapRed-subprocess shape) pick the most specific cause
        joined = "\n".join(texts)
        cause = extract_probable_cause(joined)
        if cause:
            return cause, "\n".join(joined.splitlines()[-40:])
        return None, None

    # --- output ------------------------------------------------------------

    def cat_output(self) -> Iterator:
        if not self._ran:
            self.run()
        read = self.job.OUTPUT_PROTOCOL().read
        for uri in sorted(self._gs_ls(self.output_dir)):
            name = posixpath.basename(uri)
            if name.startswith(("_", ".")):
                continue
            for line in self._gs_read(uri).splitlines():
                if line:
                    yield read(line)

    def collect_output(self) -> list:
        return list(self.cat_output())

    def counters(self) -> dict:
        merged: dict = {}
        for step_counters in self._counters_per_step:
            for group, names in step_counters.items():
                g = merged.setdefault(group, {})
                for name, amount in names.items():
                    g[name] = g.get(name, 0) + amount
        return merged

    def get_cluster_id(self) -> Optional[str]:
        return self._cluster_name

    # --- SSH tunnel (reference mrjob/dataproc.py:1266-1300) ---------------

    #: YARN resource-manager web UI port (reference _SSH_TUNNEL_CONFIG,
    #: mrjob/dataproc.py:107-112: localhost=False, port 8088, /cluster)
    _RESOURCE_MANAGER_PORT = 8088

    def _master_host(self) -> str:
        """Dataproc's master-node naming convention: ``<cluster>-m``
        (reference ``_job_tracker_host``, mrjob/dataproc.py:1266-1267)."""
        return "%s-m" % self._cluster_name

    def ssh_tunnel_args(self, bind_port: int, open_tunnel: bool = False,
                        gcloud_bin: Optional[list] = None) -> Optional[list]:
        """The ``gcloud compute ssh`` argv that forwards
        ``localhost:<bind_port>`` to the resource-manager UI on the
        master — gcloud handles keys/host resolution, so unlike EMR the
        ssh options ride AFTER the ``--`` separator (reference
        ``_ssh_tunnel_args``, mrjob/dataproc.py:1285-1300). The zone
        comes from the live cluster's gceClusterConfig. Rendering only;
        :meth:`make_ssh_tunnel` owns the process lifecycle."""
        if not self._cluster_name:
            return None
        cluster = self._clusters.get_cluster(
            self._project_id, self._region, self._cluster_name
        )
        zone_uri = (
            cluster.get("config", {})
            .get("gceClusterConfig", {})
            .get("zoneUri", "")
        )
        zone = zone_uri.split("/")[-1] or "%s-a" % self._region
        tunnel_opts = [
            "-L", "%d:%s:%d" % (
                bind_port, self._master_host(), self._RESOURCE_MANAGER_PORT,
            ),
            "-N", "-n", "-q",
        ]
        if open_tunnel:
            tunnel_opts += ["-g", "-4"]
        return list(gcloud_bin or ["gcloud"]) + [
            "compute", "ssh",
            "--zone", zone,
            self._master_host(),
            "--",
        ] + tunnel_opts

    def make_ssh_tunnel(self, open_tunnel: bool = False, bind_ports=None,
                        launch_wait_secs: Optional[float] = None,
                        gcloud_bin: Optional[list] = None):
        """SSHTunnel to the resource-manager UI (see the EMR twin).

        Two Dataproc-specific behaviors from the reference: the launch
        grace period defaults to ``min(20, check_cluster_every)`` because
        gcloud has to update project metadata on first ssh
        (``_ssh_launch_wait_secs``, mrjob/dataproc.py:1281-1284), and the
        tunnel process is fed ``b"\\n\\n"`` on stdin — an empty passphrase
        twice — because a first-ever ``gcloud compute ssh`` generates an
        SSH key and prompts for one; unanswered, it would block at the
        prompt, survive the grace period, and report an "up" tunnel that
        forwards nothing (``_launch_ssh_proc``,
        mrjob/dataproc.py:1273-1279)."""
        from mrjob_spark.dataflow.tunnel import (
            DEFAULT_SSH_BIND_PORTS, SSHTunnel,
        )

        if launch_wait_secs is None:
            # "unless we were going to check the cluster sooner anyway"
            launch_wait_secs = min(20.0, self.check_cluster_every)
        return SSHTunnel(
            render_args=lambda p: self.ssh_tunnel_args(
                p, open_tunnel=open_tunnel, gcloud_bin=gcloud_bin),
            cluster_id=self._cluster_name or "",
            name="resource manager",
            path="/cluster",
            bind_ports=(DEFAULT_SSH_BIND_PORTS if bind_ports is None
                        else bind_ports),
            open_tunnel=open_tunnel,
            launch_wait_secs=launch_wait_secs,
            stdin_payload=b"\n\n",
        )

    # --- cleanup ---------------------------------------------------------

    def cleanup(self) -> None:
        import shutil

        if self._scratch:
            shutil.rmtree(self._scratch, ignore_errors=True)
            self._scratch = None
        try:
            self._gs_rm_prefix(self._job_tmp)
        except Exception:
            pass
        if self._created_cluster and not self._leave_cluster_running:
            try:
                self._clusters.delete_cluster(
                    self._project_id, self._region, self._cluster_name
                )
            except Exception:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.cleanup()
        return False


__all__ = ["DataprocJobRunner", "DataprocException"]
