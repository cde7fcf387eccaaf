"""An executing mock EMR + S3 service for ``-r emr`` tests and queries.

Follows the shape of the reference's mock-boto3 test harness
(``tests/mock_boto3/emr.py`` is the behavioral model: clusters advance
one lifecycle stage per API call, so a polling runner observes
``STARTING → BOOTSTRAPPING → RUNNING → WAITING/TERMINATED`` and steps
``PENDING → RUNNING → COMPLETED/FAILED``) — but, like this repo's
:mod:`mockhadoop`, it EXECUTES the work instead of playing back canned
output: a ``command-runner.jar``/``hadoop-streaming`` step really runs
the rendered mapper/combiner/reducer commands (through the mockhadoop
streaming executor, with ``s3://bucket/key`` mapped into the mock S3
object store), and the step + container logs land gzipped in the
cluster's ``LogUri`` bucket in EMR's own layout::

    <log prefix>/<cluster id>/steps/<step id>/stderr.gz      (driver log4j)
    <log prefix>/<cluster id>/steps/<step id>/syslog.gz      (same records —
        real EMR's step syslog is the driver's log4j file appender, and
        it is where the REFERENCE's counter interpreter reads)
    <log prefix>/<cluster id>/steps/<step id>/stdout.gz
    <log prefix>/<cluster id>/containers/<application id>/<container>/
        {stderr,syslog}.gz

so the ``-r emr`` runner's counter fetch and failure diagnosis read the
same artifacts they would on AWS.

The clock is fake and deterministic: every API call advances it by
``tick_secs``. ``sleep(secs)`` advances it manually (for idle-timeout
tests) and ``self_terminate(cluster_id)`` simulates the master node
dying under a pooled job (the reference's
``_CLUSTER_SELF_TERMINATED_RE`` scenario, ``mrjob/emr.py:219-221``).

Clients are boto3-shaped duck types covering the call subset the runner
uses — no boto3/botocore import, so the mock runs anywhere.
"""

from __future__ import annotations

import gzip
import io
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

#: the 4.x+ intermediary jar EMR uses to launch anything on a cluster
COMMAND_RUNNER_JAR = "command-runner.jar"

_APP_ID_RE = re.compile(r"application_\d+_\d+")


class MockClientError(Exception):
    """Stands in for botocore ClientError (same role, no botocore dep).

    ``response``, when given, mirrors the botocore shape
    (``{"Error": {"Code": ..., "HTTPStatusCode": ...}}``) so the
    engine's duck-typed classifiers (:mod:`cloudretry`) read it like
    the real thing."""

    def __init__(self, message: str, response: dict | None = None):
        super().__init__(message)
        if response is not None:
            self.response = response


def _parse_s3_uri(uri: str) -> tuple:
    if not uri.startswith(("s3://", "s3a://", "s3n://")):
        raise ValueError("not an S3 URI: %r" % uri)
    rest = uri.split("://", 1)[1]
    bucket, _, key = rest.partition("/")
    return bucket, key


# ---------------------------------------------------------------------------
# S3
# ---------------------------------------------------------------------------


class MockS3Client:
    """Objects live as plain files under ``root/<bucket>/<key>`` — the
    SAME layout :mod:`mockhadoop` maps ``s3://bucket/key`` to, so EMR
    steps and the runner's uploads see one store."""

    def __init__(self, root: str):
        self.root = root
        #: max keys per list_objects_v2 page (real S3 caps at 1000).
        #: Tests shrink this to force multi-page listings so any
        #: consumer that forgets to paginate loses keys loudly.
        self.page_size = 1000
        #: (Bucket, Key) -> the transfer Config passed to upload_file
        self.upload_configs: dict = {}
        os.makedirs(root, exist_ok=True)

    def _path(self, bucket: str, key: str = "") -> str:
        return os.path.join(self.root, bucket, key.replace("/", os.sep))

    def create_bucket(self, Bucket: str, **_):
        os.makedirs(self._path(Bucket), exist_ok=True)
        return {"Location": "/" + Bucket}

    def head_bucket(self, Bucket: str):
        if not os.path.isdir(self._path(Bucket)):
            raise MockClientError("NoSuchBucket: %s" % Bucket)
        return {}

    def put_object(self, Bucket: str, Key: str, Body=b"", **_):
        path = self._path(Bucket, Key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = Body if isinstance(Body, bytes) else Body.read()
        with open(path, "wb") as fh:
            fh.write(data)
        return {}

    def upload_file(self, Filename: str, Bucket: str, Key: str,
                    Config=None, **_):
        # the transfer Config (multipart part size) is recorded so tests
        # can assert cloud_part_size_mb reaches the upload call the way
        # the reference's TransferConfig does (mrjob/fs/s3.py:204-217)
        self.upload_configs[(Bucket, Key)] = Config
        path = self._path(Bucket, Key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.copyfile(Filename, path)

    def get_object(self, Bucket: str, Key: str, **_):
        path = self._path(Bucket, Key)
        if not os.path.isfile(path):
            raise MockClientError("NoSuchKey: s3://%s/%s" % (Bucket, Key))
        with open(path, "rb") as fh:
            return {"Body": io.BytesIO(fh.read())}

    def list_objects_v2(self, Bucket: str, Prefix: str = "",
                        ContinuationToken: str = "", MaxKeys: int = 0, **_):
        """Paginated like the real API: at most ``MaxKeys`` (default
        ``self.page_size``, real S3's 1000) keys per call, with
        ``IsTruncated`` + ``NextContinuationToken`` (a start-after key,
        which is how real tokens behave modulo opacity)."""
        base = self._path(Bucket)
        contents = []
        for dirpath, _, names in os.walk(base):
            for name in sorted(names):
                full = os.path.join(dirpath, name)
                key = os.path.relpath(full, base).replace(os.sep, "/")
                if key.startswith(Prefix):
                    contents.append(
                        {
                            "Key": key,
                            "Size": os.path.getsize(full),
                            # epoch float, not datetime: callers accept
                            # both shapes (tools_emr._to_epoch)
                            "LastModified": os.path.getmtime(full),
                        }
                    )
        contents.sort(key=lambda c: c["Key"])
        if ContinuationToken:
            contents = [c for c in contents if c["Key"] > ContinuationToken]
        page_size = MaxKeys or self.page_size
        page, rest = contents[:page_size], contents[page_size:]
        resp = {
            "Contents": page,
            "KeyCount": len(page),
            "IsTruncated": bool(rest),
        }
        if rest:
            resp["NextContinuationToken"] = page[-1]["Key"]
        return resp

    def delete_object(self, Bucket: str, Key: str, **_):
        path = self._path(Bucket, Key)
        if os.path.isfile(path):
            os.unlink(path)
        return {}


# ---------------------------------------------------------------------------
# EMR
# ---------------------------------------------------------------------------


class MockEMRClient:
    """boto3-``emr``-shaped view over a :class:`MockEMRService`."""

    def __init__(self, service: "MockEMRService"):
        self._svc = service

    def __getattr__(self, name):
        method = getattr(self._svc, "api_" + name, None)
        if method is None:
            raise AttributeError(name)

        def call(**kwargs):
            self._svc._on_call()
            try:
                return method(**kwargs)
            finally:
                self._svc._save()

        return call


class MockIAMClient:
    """boto3-``iam``-shaped view over the service's account-level role
    store (``iam_api_*`` methods). ``deny`` simulates an account whose
    credentials can drive EMR but not IAM — every call raises the
    botocore-shaped 403 the runner's fallback path keys on."""

    def __init__(self, service: "MockEMRService", deny: bool = False):
        self._svc = service
        self._deny = deny

    def __getattr__(self, name):
        method = getattr(self._svc, "iam_api_" + name, None)
        if method is None:
            raise AttributeError(name)

        def call(**kwargs):
            if self._deny:
                raise MockClientError(
                    "User is not authorized to perform iam:%s" % name,
                    response={"Error": {
                        "Code": "AccessDenied", "HTTPStatusCode": 403,
                    }},
                )
            self._svc._on_call()
            try:
                return method(**kwargs)
            finally:
                self._svc._save()

        return call


class MockEC2Client:
    """boto3-``ec2``-shaped view (``ec2_api_*`` methods) — just enough
    for base-AMI discovery (``describe_images``)."""

    def __init__(self, service: "MockEMRService"):
        self._svc = service

    def __getattr__(self, name):
        method = getattr(self._svc, "ec2_api_" + name, None)
        if method is None:
            raise AttributeError(name)
        return lambda **kwargs: method(**kwargs)


#: the mock EC2 image catalog: a realistic mix so the base-AMI filter
#: has something to reject — newest-stable first is what callers must
#: get back, NOT catalog order
MOCK_EC2_IMAGES = [
    {"ImageId": "ami-older", "Name": "amzn-ami-hvm-2017.03.0-x86_64-ebs",
     "Architecture": "x86_64", "RootDeviceType": "ebs",
     "VirtualizationType": "hvm", "CreationDate": "2017-03-01T00:00:00Z",
     "BlockDeviceMappings": [{"DeviceName": "/dev/xvda"}],
     "Description": "Amazon Linux AMI 2017.03.0"},
    {"ImageId": "ami-newest", "Name": "amzn-ami-hvm-2018.03.0-x86_64-ebs",
     "Architecture": "x86_64", "RootDeviceType": "ebs",
     "VirtualizationType": "hvm", "CreationDate": "2018-03-01T00:00:00Z",
     "BlockDeviceMappings": [{"DeviceName": "/dev/xvda"}],
     "Description": "Amazon Linux AMI 2018.03.0"},
    # rejects: release-candidate version string
    {"ImageId": "ami-rc", "Name": "amzn-ami-hvm-2018.03.rc-1-x86_64-ebs",
     "Architecture": "x86_64", "RootDeviceType": "ebs",
     "VirtualizationType": "hvm", "CreationDate": "2018-02-20T00:00:00Z",
     "BlockDeviceMappings": [{"DeviceName": "/dev/xvda"}]},
    # rejects: Amazon Linux 2 naming
    {"ImageId": "ami-al2", "Name": "amzn2-ami-hvm-2.0-x86_64-ebs",
     "Architecture": "x86_64", "RootDeviceType": "ebs",
     "VirtualizationType": "hvm", "CreationDate": "2018-06-01T00:00:00Z",
     "BlockDeviceMappings": [{"DeviceName": "/dev/xvda"}]},
    # rejects: two volumes
    {"ImageId": "ami-2vol", "Name": "amzn-ami-hvm-2017.09.0-x86_64-ebs",
     "Architecture": "x86_64", "RootDeviceType": "ebs",
     "VirtualizationType": "hvm", "CreationDate": "2017-09-01T00:00:00Z",
     "BlockDeviceMappings": [{"DeviceName": "/dev/xvda"},
                             {"DeviceName": "/dev/xvdb"}]},
    # rejects: no CreationDate
    {"ImageId": "ami-nodate", "Name": "amzn-ami-hvm-2017.06.0-x86_64-ebs",
     "Architecture": "x86_64", "RootDeviceType": "ebs",
     "VirtualizationType": "hvm", "CreationDate": "",
     "BlockDeviceMappings": [{"DeviceName": "/dev/xvda"}]},
]


class MockEMRService:
    """The cluster state store + executor behind :class:`MockEMRClient`.

    :param base_dir: everything (S3 objects, scratch, logs) lives here.
    :param tick_secs: fake-clock advance per API call.
    """

    def __init__(self, base_dir, tick_secs: float = 10.0,
                 log_delivery_lag_secs: float = 0.0):
        base_dir = str(base_dir)
        self.base_dir = base_dir
        self.s3_root = os.path.join(base_dir, "s3")
        self.s3 = MockS3Client(self.s3_root)
        #: one directory per cluster node, for the mock ssh binary
        #: (``MOCK_SSH_ROOT``); node disks get logs the moment a step
        #: ends, while S3 'delivery' can lag (below) — real EMR's shape
        self.nodes_root = os.path.join(base_dir, "nodes")
        os.makedirs(self.nodes_root, exist_ok=True)
        self._state_path = os.path.join(base_dir, "emr_state.json")
        self.now = 1_000_000.0
        self.tick_secs = tick_secs
        #: fake-clock seconds between a step finishing and its logs
        #: appearing at the S3 LogUri (real EMR: multiple minutes);
        #: node-disk copies are immediate either way
        self.log_delivery_lag_secs = log_delivery_lag_secs
        self.clusters: dict = {}
        #: account-level IAM store: role name -> {"document": dict,
        #: "policy_arns": [...]}, profile name -> {"roles": [names]}
        self.iam_roles: dict = {}
        self.iam_profiles: dict = {}
        self._seq = 0
        self._load()

    # -- persistence (cluster state survives process boundaries, so a
    # CLI `-r emr` run in one process can pool-reuse a cluster another
    # process left WAITING — S3 objects already persist as files) ------

    def _load(self) -> None:
        if not os.path.isfile(self._state_path):
            return
        with open(self._state_path) as fh:
            state = json.load(fh)
        self.now = max(self.now, state["now"])
        self._seq = max(self._seq, state["seq"])
        self.clusters = state["clusters"]
        self.iam_roles = state.get("iam_roles", {})
        self.iam_profiles = state.get("iam_profiles", {})

    def _save(self) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"now": self.now, "seq": self._seq,
                 "clusters": self.clusters,
                 "iam_roles": self.iam_roles,
                 "iam_profiles": self.iam_profiles}, fh,
            )
        os.replace(tmp, self._state_path)

    # -- clients (what tests/queries hand to the runner) ---------------

    def emr_client(self) -> MockEMRClient:
        return MockEMRClient(self)

    def s3_client(self) -> MockS3Client:
        return self.s3

    def iam_client(self, deny: bool = False) -> MockIAMClient:
        return MockIAMClient(self, deny=deny)

    def ec2_client(self) -> MockEC2Client:
        return MockEC2Client(self)

    # -- clock ----------------------------------------------------------

    def _on_call(self):
        self._load()
        self.now += self.tick_secs
        self._advance_all()

    def sleep(self, secs: float):
        """Advance the fake clock without an API call (idle tests)."""
        self.now += secs
        self._advance_all()
        self._save()

    # -- helpers --------------------------------------------------------

    def _next_id(self, prefix: str) -> str:
        self._seq += 1
        return "%s-MOCK%06d" % (prefix, self._seq)

    def _cluster(self, cluster_id: str) -> dict:
        try:
            return self.clusters[cluster_id]
        except KeyError:
            raise MockClientError("no such cluster: %s" % cluster_id)

    @staticmethod
    def _set_state(entity: dict, state: str, code: str = "",
                   message: str = "") -> None:
        entity["Status"]["State"] = state
        if code or message:
            entity["Status"]["StateChangeReason"] = {
                "Code": code, "Message": message,
            }

    # -- API: clusters ---------------------------------------------------

    def api_run_job_flow(self, **params):
        cluster_id = self._next_id("j")
        instances = params.get("Instances") or {}
        auto_policy = params.get("AutoTerminationPolicy") or {}
        master_dns = "master.%s.mock" % cluster_id
        if instances.get("InstanceFleets"):
            n_core = sum(
                (f.get("TargetOnDemandCapacity", 0)
                 + f.get("TargetSpotCapacity", 0)) or 0
                for f in instances["InstanceFleets"]
                if f.get("InstanceFleetType") in ("CORE", "TASK")
            ) or 1
        elif instances.get("InstanceGroups"):
            # the request's THIRD shape (real RunJobFlow accepts all
            # three): explicit instance groups with InstanceRole
            n_core = sum(
                g.get("InstanceCount", 0)
                for g in instances["InstanceGroups"]
                if g.get("InstanceRole") in ("CORE", "TASK")
            )
        else:
            n_core = max(0, instances.get("InstanceCount", 1) - 1)
        core_hosts = [
            "10-0-0-%d.%s.mock" % (i + 1, cluster_id)
            for i in range(n_core)
        ]
        cluster = {
            "Id": cluster_id,
            "Name": params.get("Name", ""),
            "Status": {
                "State": "STARTING",
                "StateChangeReason": {},
                "Timeline": {"CreationDateTime": self.now},
            },
            "ReleaseLabel": params.get("ReleaseLabel", "emr-6.9.0"),
            "LogUri": params.get("LogUri", ""),
            "Applications": params.get("Applications") or [],
            "Tags": list(params.get("Tags") or []),
            "StepConcurrencyLevel": params.get("StepConcurrencyLevel", 1),
            "AutoTerminate": not instances.get(
                "KeepJobFlowAliveWhenNoSteps", False
            ),
            "MasterPublicDnsName": master_dns,
            **({"EbsRootVolumeSize": params["EbsRootVolumeSize"]}
               if params.get("EbsRootVolumeSize") else {}),
            "_core_hosts": core_hosts,
            "_job_flow_role": params.get("JobFlowRole"),
            "_service_role": params.get("ServiceRole"),
            "_custom_ami_id": params.get("CustomAmiId"),
            "_instances": instances,
            "_bootstrap": params.get("BootstrapActions") or [],
            "_idle_timeout": auto_policy.get("IdleTimeout"),
            "_steps": [],
            "_pending_logs": [],
            "_last_activity": self.now,
        }
        # nodes get on-disk filesystems the mock ssh binary can land on
        for host in [master_dns] + core_hosts:
            os.makedirs(os.path.join(self.nodes_root, host), exist_ok=True)
        self.clusters[cluster_id] = cluster
        return {"JobFlowId": cluster_id}

    def api_list_instances(self, ClusterId: str, InstanceGroupTypes=None,
                           InstanceStates=None, **_):
        """The shape ``_ssh_worker_hosts`` reads (the reference paginates
        ``list_instances`` for CORE/TASK RUNNING nodes and collects
        ``PrivateIpAddress``, mrjob/emr.py:2089-2110)."""
        c = self._cluster(ClusterId)
        running = not c["Status"]["State"].startswith("TERMINAT")
        state = "RUNNING" if running else "TERMINATED"
        instances = [{
            "Id": "ci-%s-0" % ClusterId,
            "InstanceGroupType": "MASTER",
            "PublicDnsName": c["MasterPublicDnsName"],
            "PrivateDnsName": c["MasterPublicDnsName"],
            "PrivateIpAddress": c["MasterPublicDnsName"],
            "Status": {"State": state},
        }]
        for i, host in enumerate(c.get("_core_hosts") or []):
            instances.append({
                "Id": "ci-%s-%d" % (ClusterId, i + 1),
                "InstanceGroupType": "CORE",
                "PublicDnsName": "",
                "PrivateDnsName": host,
                "PrivateIpAddress": host,
                "Status": {"State": state},
            })
        if InstanceGroupTypes:
            instances = [
                x for x in instances
                if x["InstanceGroupType"] in InstanceGroupTypes
            ]
        if InstanceStates:
            instances = [
                x for x in instances
                if x["Status"]["State"] in InstanceStates
            ]
        return {"Instances": instances}

    #: EMR's public instance-normalization factors (units per hour by
    #: size suffix): small=1, medium=2, large=4, xlarge=8, 2xlarge=16…
    _NORM_UNITS = {
        "small": 1, "medium": 2, "large": 4, "xlarge": 8,
        "2xlarge": 16, "4xlarge": 32, "8xlarge": 64, "16xlarge": 128,
    }

    def _normalized_instance_hours(self, c: dict) -> int:
        """Like real EMR: billed by the FULL hour (ceil) times the
        summed normalization units of all instances, updated while the
        cluster runs and frozen at termination."""
        import math

        timeline = c["Status"].get("Timeline", {})
        created = timeline.get("CreationDateTime", self.now)
        end = timeline.get("EndDateTime") or self.now
        full_hours = max(1, math.ceil((end - created) / 3600.0))
        inst = c.get("_instances") or {}

        def units(itype: str) -> int:
            suffix = str(itype).rsplit(".", 1)[-1]
            return self._NORM_UNITS.get(suffix, 4)

        fleets = inst.get("InstanceFleets")
        if fleets:
            # a weighted capacity unit ≈ one xlarge-equivalent (8 units)
            total_units = 8 * sum(
                (f.get("TargetOnDemandCapacity", 0)
                 + f.get("TargetSpotCapacity", 0)) or 1
                for f in fleets
            )
        elif inst.get("InstanceGroups"):
            total_units = sum(
                g.get("InstanceCount", 1) * units(g.get("InstanceType", ""))
                for g in inst["InstanceGroups"]
            )
        else:
            count = inst.get("InstanceCount", 1)
            total_units = units(
                inst.get("MasterInstanceType", "")
            ) + max(0, count - 1) * units(
                inst.get("SlaveInstanceType", "")
            )
        return full_hours * total_units

    #: what real EMR reports per application on DescribeCluster when the
    #: request named the app without a version (AWS resolves it from the
    #: release); Hadoop matches the executing mock engine's version
    _APP_VERSIONS = {"Hadoop": "3.3.6", "Spark": "3.4.0"}

    def api_describe_cluster(self, ClusterId: str):
        c = self._cluster(ClusterId)
        public = {k: v for k, v in c.items() if not k.startswith("_")}
        inst_attrs = {}
        if (c.get("_instances") or {}).get("Ec2KeyName"):
            inst_attrs["Ec2KeyName"] = c["_instances"]["Ec2KeyName"]
        if (c.get("_instances") or {}).get("Ec2SubnetId"):
            inst_attrs["Ec2SubnetId"] = c["_instances"]["Ec2SubnetId"]
        if c.get("_job_flow_role"):
            # DescribeCluster reports the instance profile here
            inst_attrs["IamInstanceProfile"] = c["_job_flow_role"]
        # always present on the real API (pool matching indexes into it)
        public["Ec2InstanceAttributes"] = inst_attrs
        if c.get("_service_role"):
            public["ServiceRole"] = c["_service_role"]
        if c.get("_custom_ami_id"):
            public["CustomAmiId"] = c["_custom_ami_id"]
        apps = list(public.get("Applications") or [])
        if not any(a.get("Name") == "Hadoop" for a in apps):
            # every EMR release ships Hadoop: DescribeCluster reports it
            # even when RunJobFlow didn't name it
            apps.insert(0, {"Name": "Hadoop"})
        public["Applications"] = [
            dict(a, Version=a.get("Version")
                 or self._APP_VERSIONS.get(a.get("Name"), "0"))
            for a in apps
        ]
        public["NormalizedInstanceHours"] = \
            self._normalized_instance_hours(c)
        public["InstanceCollectionType"] = (
            "INSTANCE_FLEET"
            if (c.get("_instances") or {}).get("InstanceFleets")
            else "INSTANCE_GROUP"
        )
        return {"Cluster": public}

    def api_list_instance_fleets(self, ClusterId: str):
        """Fleet clusters only (the real API errors on group clusters):
        each requested fleet comes back fully provisioned — targets met,
        every configured type present as a specification."""
        c = self._cluster(ClusterId)
        fleets = []
        for req in (c.get("_instances") or {}).get(
            "InstanceFleets"
        ) or []:
            fleets.append({
                "InstanceFleetType": req.get("InstanceFleetType"),
                "InstanceTypeSpecifications": [
                    {
                        "InstanceType": cfg.get("InstanceType"),
                        "WeightedCapacity": cfg.get(
                            "WeightedCapacity", 1
                        ),
                    }
                    for cfg in req.get("InstanceTypeConfigs") or []
                ],
                "ProvisionedOnDemandCapacity": req.get(
                    "TargetOnDemandCapacity", 0
                ),
                "ProvisionedSpotCapacity": req.get(
                    "TargetSpotCapacity", 0
                ),
            })
        if not fleets:
            raise MockClientError(
                "InvalidRequestException: cluster %s does not use"
                " instance fleets" % ClusterId
            )
        return {"InstanceFleets": fleets}

    def api_list_clusters(self, ClusterStates=None, **_):
        out = []
        for c in self.clusters.values():
            if ClusterStates and c["Status"]["State"] not in ClusterStates:
                continue
            out.append({
                "Id": c["Id"], "Name": c["Name"], "Status": c["Status"],
                # real ListClusters summaries carry this; the reference's
                # pool ranking divides it by hours-since-ready
                "NormalizedInstanceHours":
                    self._normalized_instance_hours(c),
            })
        return {"Clusters": out}

    def api_list_instance_groups(self, ClusterId: str):
        c = self._cluster(ClusterId)
        inst = c.get("_instances") or {}
        if inst.get("InstanceFleets"):
            raise MockClientError(
                "InvalidRequestException: cluster %s does not use"
                " instance groups" % ClusterId
            )
        if inst.get("InstanceGroups"):
            # explicit-groups request shape: report what was asked for
            return {"InstanceGroups": [
                {
                    "InstanceGroupType": g.get("InstanceRole"),
                    "InstanceType": g.get("InstanceType", ""),
                    "Market": g.get("Market", "ON_DEMAND"),
                    **({"BidPrice": g["BidPrice"]}
                       if g.get("BidPrice") else {}),
                    "RequestedInstanceCount": g.get("InstanceCount", 1),
                    "RunningInstanceCount": g.get("InstanceCount", 1),
                }
                for g in inst["InstanceGroups"]
            ]}
        n_core = max(0, inst.get("InstanceCount", 1) - 1)
        # real ListInstanceGroups always reports the purchase Market
        # (pool satisfaction checks read it, reference mrjob/pool.py:174)
        groups = [{
            "InstanceGroupType": "MASTER",
            "InstanceType": inst.get("MasterInstanceType", ""),
            "Market": "ON_DEMAND",
            "RequestedInstanceCount": 1,
            "RunningInstanceCount": 1,
        }]
        if n_core:
            groups.append({
                "InstanceGroupType": "CORE",
                "InstanceType": inst.get("SlaveInstanceType", ""),
                "Market": "ON_DEMAND",
                "RequestedInstanceCount": n_core,
                "RunningInstanceCount": n_core,
            })
        return {"InstanceGroups": groups}

    def api_terminate_job_flows(self, JobFlowIds):
        for cid in JobFlowIds:
            c = self._cluster(cid)
            if not c["Status"]["State"].startswith("TERMINATED"):
                self._set_state(
                    c, "TERMINATED", "USER_REQUEST",
                    "Terminated by user request",
                )
                c["Status"]["Timeline"]["EndDateTime"] = self.now
                for s in c["_steps"]:
                    if s["Status"]["State"] in ("PENDING", "RUNNING"):
                        self._set_state(s, "CANCELLED")
        return {}

    def api_add_tags(self, ResourceId: str, Tags):
        c = self._cluster(ResourceId)
        existing = {t["Key"]: t for t in c["Tags"]}
        for tag in Tags:
            existing[tag["Key"]] = dict(tag)
        c["Tags"] = list(existing.values())
        return {}

    def api_remove_tags(self, ResourceId: str, TagKeys):
        c = self._cluster(ResourceId)
        c["Tags"] = [t for t in c["Tags"] if t["Key"] not in TagKeys]
        return {}

    # -- API: steps -------------------------------------------------------

    def api_add_job_flow_steps(self, JobFlowId: str, Steps):
        c = self._cluster(JobFlowId)
        if c["Status"]["State"].startswith("TERMINAT"):
            raise MockClientError(
                "cluster %s is %s" % (JobFlowId, c["Status"]["State"])
            )
        ids = []
        for step in Steps:
            step_id = self._next_id("s")
            c["_steps"].append({
                "Id": step_id,
                "Name": step.get("Name", ""),
                "ActionOnFailure": step.get(
                    "ActionOnFailure", "TERMINATE_CLUSTER"
                ),
                "HadoopJarStep": step["HadoopJarStep"],
                "Status": {
                    "State": "PENDING",
                    "StateChangeReason": {},
                    "Timeline": {"CreationDateTime": self.now},
                },
            })
            ids.append(step_id)
        c["_last_activity"] = self.now
        return {"StepIds": ids}

    def api_describe_step(self, ClusterId: str, StepId: str):
        c = self._cluster(ClusterId)
        for s in c["_steps"]:
            if s["Id"] == StepId:
                public = {k: v for k, v in s.items() if not k.startswith("_")}
                return {"Step": public}
        raise MockClientError("no such step: %s" % StepId)

    def api_list_steps(self, ClusterId: str, StepStates=None, **_):
        c = self._cluster(ClusterId)
        steps = [
            {k: v for k, v in s.items() if not k.startswith("_")}
            for s in c["_steps"]
            if not StepStates or s["Status"]["State"] in StepStates
        ]
        # EMR lists steps in reverse order of creation
        return {"Steps": list(reversed(steps))}

    # -- lifecycle ---------------------------------------------------------

    # -- API: IAM (account-level role store; page size forced small so
    # callers' Marker/IsTruncated walks actually get exercised) ----------

    _IAM_PAGE = 2

    def _iam_page(self, items: list, result_key: str, Marker=None,
                  **_) -> dict:
        start = int(Marker or 0)
        page = items[start:start + self._IAM_PAGE]
        resp = {result_key: page}
        if start + self._IAM_PAGE < len(items):
            resp["IsTruncated"] = True
            resp["Marker"] = str(start + self._IAM_PAGE)
        return resp

    def _iam_role_entry(self, name: str) -> dict:
        role = self.iam_roles[name]
        return {
            "RoleName": name,
            "Arn": "arn:aws:iam::123456789012:role/%s" % name,
            "AssumeRolePolicyDocument": role["document"],
        }

    def iam_api_list_roles(self, **kwargs):
        names = sorted(self.iam_roles)
        return self._iam_page(
            [self._iam_role_entry(n) for n in names], "Roles", **kwargs)

    def iam_api_create_role(self, RoleName, AssumeRolePolicyDocument,
                            **_):
        if RoleName in self.iam_roles:
            raise MockClientError(
                "EntityAlreadyExists: role %s" % RoleName,
                response={"Error": {"Code": "EntityAlreadyExists",
                                    "HTTPStatusCode": 409}},
            )
        # boto3 returns the document URL-decoded as a dict on reads but
        # accepts a JSON string on writes — store decoded, like AWS
        self.iam_roles[RoleName] = {
            "document": json.loads(AssumeRolePolicyDocument),
            "policy_arns": [],
        }
        return {"Role": self._iam_role_entry(RoleName)}

    def iam_api_attach_role_policy(self, RoleName, PolicyArn, **_):
        if RoleName not in self.iam_roles:
            raise MockClientError("NoSuchEntity: %s" % RoleName)
        arns = self.iam_roles[RoleName]["policy_arns"]
        if PolicyArn not in arns:
            arns.append(PolicyArn)
        return {}

    def iam_api_list_attached_role_policies(self, RoleName, **kwargs):
        if RoleName not in self.iam_roles:
            raise MockClientError("NoSuchEntity: %s" % RoleName)
        attached = [
            {"PolicyArn": arn, "PolicyName": arn.rsplit("/", 1)[-1]}
            for arn in self.iam_roles[RoleName]["policy_arns"]
        ]
        return self._iam_page(attached, "AttachedPolicies", **kwargs)

    def iam_api_list_instance_profiles(self, **kwargs):
        profiles = [
            {
                "InstanceProfileName": name,
                "Arn": "arn:aws:iam::123456789012:instance-profile/%s"
                       % name,
                "Roles": [self._iam_role_entry(r)
                          for r in prof["roles"]],
            }
            for name, prof in sorted(self.iam_profiles.items())
        ]
        return self._iam_page(profiles, "InstanceProfiles", **kwargs)

    def iam_api_create_instance_profile(self, InstanceProfileName, **_):
        if InstanceProfileName in self.iam_profiles:
            raise MockClientError(
                "EntityAlreadyExists: %s" % InstanceProfileName)
        self.iam_profiles[InstanceProfileName] = {"roles": []}
        return {}

    def iam_api_add_role_to_instance_profile(self, InstanceProfileName,
                                             RoleName, **_):
        if InstanceProfileName not in self.iam_profiles:
            raise MockClientError(
                "NoSuchEntity: %s" % InstanceProfileName)
        if RoleName not in self.iam_roles:
            raise MockClientError("NoSuchEntity: %s" % RoleName)
        self.iam_profiles[InstanceProfileName]["roles"].append(RoleName)
        return {}

    # -- API: EC2 (base-AMI discovery) -----------------------------------

    def ec2_api_describe_images(self, Owners=None, Filters=None, **_):
        images = list(MOCK_EC2_IMAGES)
        attr_for = {
            "architecture": "Architecture",
            "root-device-type": "RootDeviceType",
            "virtualization-type": "VirtualizationType",
        }
        for f in Filters or []:
            attr = attr_for.get(f.get("Name"))
            if attr is None:
                continue
            values = f.get("Values") or []
            images = [i for i in images if i.get(attr) in values]
        return {"Images": images}

    def self_terminate(self, cluster_id: str) -> None:
        """Simulate the master node dying (spot loss) — the message shape
        the reference's self-termination regex matches."""
        c = self._cluster(cluster_id)
        self._set_state(
            c, "TERMINATED_WITH_ERRORS", "INSTANCE_FAILURE",
            "The master node was terminated",
        )
        c["Status"]["Timeline"]["EndDateTime"] = self.now
        for s in c["_steps"]:
            if s["Status"]["State"] in ("PENDING", "RUNNING"):
                self._set_state(s, "CANCELLED", "", "Job terminated")
        self._save()

    def _advance_all(self) -> None:
        for c in list(self.clusters.values()):
            self._flush_due_logs(c)
            self._advance(c)

    def _flush_due_logs(self, c: dict) -> None:
        """Deliver lagged step logs to S3 once the fake clock passes
        their due time (real EMR ships LogUri files minutes late)."""
        import base64

        still_pending = []
        for entry in c.get("_pending_logs") or []:
            if self.now >= entry["due"]:
                self.s3.put_object(
                    Bucket=entry["bucket"], Key=entry["key"],
                    Body=base64.b64decode(entry["b64"]),
                )
            else:
                still_pending.append(entry)
        c["_pending_logs"] = still_pending

    def _advance(self, c: dict) -> None:
        state = c["Status"]["State"]
        if state.startswith("TERMINAT"):
            if state == "TERMINATING":
                self._set_state(
                    c, "TERMINATED", "ALL_STEPS_COMPLETED",
                    "Steps completed",
                )
                # freeze the billing clock (real DescribeCluster reports
                # Timeline.EndDateTime on terminated clusters)
                c["Status"]["Timeline"]["EndDateTime"] = self.now
            return
        if state == "STARTING":
            self._set_state(c, "BOOTSTRAPPING")
            return
        if state == "BOOTSTRAPPING":
            self._set_state(
                c, "RUNNING" if self._pending(c) else "WAITING",
                "", "Running step" if self._pending(c) else
                "Cluster ready to run steps.",
            )
            # real EMR stamps ReadyDateTime when provisioning ends —
            # billing/usage tools key on it (audit_usage bootstrap rows)
            c["Status"]["Timeline"].setdefault("ReadyDateTime", self.now)
            return

        # RUNNING / WAITING: progress one step stage per call
        running = [s for s in c["_steps"]
                   if s["Status"]["State"] == "RUNNING"]
        if running:
            self._execute_step(c, running[0])
            c["_last_activity"] = self.now
            return
        pending = self._pending(c)
        if pending:
            self._set_state(pending[0], "RUNNING")
            pending[0]["Status"]["Timeline"]["StartDateTime"] = self.now
            self._set_state(c, "RUNNING")
            c["_last_activity"] = self.now
            return
        # no work left
        if c["AutoTerminate"] and c["_steps"]:
            # "terminate after the last step completes" — the real
            # KeepJobFlowAliveWhenNoSteps=False contract
            self._set_state(c, "TERMINATING")
            return
        if c["AutoTerminate"]:
            # no steps EVER added: real EMR doesn't vanish the moment
            # provisioning ends — clients (the reference included) make
            # several describe/tag calls between run_job_flow and
            # add_job_flow_steps. Grant a provisioning-scale grace
            # window before reaping a stepless throwaway cluster.
            created = c["Status"]["Timeline"].get(
                "CreationDateTime", self.now
            )
            if self.now - created > 120.0:
                self._set_state(c, "TERMINATING")
                return
        if state != "WAITING":
            self._set_state(
                c, "WAITING", "", "Cluster ready to run steps."
            )
            c["_last_activity"] = self.now
            return
        idle = c.get("_idle_timeout")
        if idle and self.now - c["_last_activity"] > idle:
            self._set_state(
                c, "TERMINATED", "ALL_STEPS_COMPLETED",
                "Terminated due to idle timeout",
            )
            c["Status"]["Timeline"]["EndDateTime"] = self.now

    @staticmethod
    def _pending(c: dict) -> list:
        return [s for s in c["_steps"] if s["Status"]["State"] == "PENDING"]

    # -- step execution ------------------------------------------------------

    def _execute_step(self, c: dict, step: dict) -> None:
        jar_step = step["HadoopJarStep"]
        jar = jar_step.get("Jar", "")
        args = list(jar_step.get("Args") or [])

        if os.path.basename(jar) == COMMAND_RUNNER_JAR and args and \
                args[0] == "hadoop-streaming":
            streaming_args = args[1:]
        elif os.path.basename(jar) == COMMAND_RUNNER_JAR and args and \
                args[0] == "spark-submit":
            self._execute_spark_submit_step(c, step, args)
            return
        elif "streaming" in os.path.basename(jar):
            streaming_args = args
        elif jar.endswith(".jar") and \
                os.path.basename(jar) != COMMAND_RUNNER_JAR:
            # a plain custom HadoopJarStep (the reference's 'jar' steps)
            self._execute_plain_jar_step(c, step, jar, args)
            return
        else:
            self._finish_step(
                c, step, 1, b"", b"mockemr: only hadoop-streaming,"
                b" spark-submit and custom-jar steps are executed by"
                b" this mock\n",
            )
            return

        log_dir = tempfile.mkdtemp(prefix="mockemr-logs-")
        try:
            import mrjob_spark

            repo_root = os.path.dirname(os.path.dirname(
                os.path.abspath(mrjob_spark.__file__)))
            env = dict(os.environ)
            env.update({
                "MOCK_HDFS_ROOT": self.s3_root,
                "MOCK_FS_SCHEME": "s3",
                "MOCK_HADOOP_LOG_DIR": log_dir,
                "PYTHONPATH": repo_root + os.pathsep
                + env.get("PYTHONPATH", ""),
            })
            proc = subprocess.run(
                [sys.executable, "-m", "mrjob_spark.testing.mockhadoop",
                 "jar", "hadoop-streaming.jar"] + streaming_args,
                capture_output=True, env=env,
            )
            self._finish_step(
                c, step, proc.returncode, proc.stdout, proc.stderr,
                container_log_dir=log_dir,
            )
        finally:
            shutil.rmtree(log_dir, ignore_errors=True)

    def _map_s3_operand(self, a: str) -> str:
        """Map ``s3://bucket/key`` (including comma-joined path lists,
        the Hadoop multi-input shape) to its on-disk store path — the
        mock's stand-in for cluster-side EMRFS resolution."""
        parts = []
        for part in str(a).split(","):
            if part.startswith(("s3://", "s3a://", "s3n://")):
                rest = part.split("://", 1)[1]
                part = os.path.join(
                    self.s3_root, rest.replace("/", os.sep)
                )
            parts.append(part)
        return ",".join(parts)

    def _execute_plain_jar_step(self, c: dict, step: dict, jar: str,
                                args: list) -> None:
        """Run a custom HadoopJarStep (reference ``'jar'`` steps,
        mrjob/emr.py HadoopJarStep) as a REAL java process: the jar is
        resolved from the store, s3:// operands map to store paths (on
        a real cluster ``hadoop jar`` resolves them through EMRFS), and
        MainClass selects ``-cp jar Main`` over ``-jar``."""
        import shutil as _shutil

        jar_path = self._map_s3_operand(jar)
        mapped = [self._map_s3_operand(a) for a in args]
        java = os.path.join(
            os.environ.get("JAVA_HOME", ""), "bin", "java"
        )
        if not os.path.exists(java):
            java = _shutil.which("java") or "java"
        main_class = step["HadoopJarStep"].get("MainClass")
        cmd = [java]
        if main_class:
            cmd += ["-cp", jar_path, main_class]
        else:
            cmd += ["-jar", jar_path]
        cmd += mapped
        proc = subprocess.run(cmd, capture_output=True)
        self._finish_step(
            c, step, proc.returncode, proc.stdout, proc.stderr
        )

    def _execute_spark_submit_step(self, c: dict, step: dict,
                                   args: list) -> None:
        """Run a ``command-runner.jar spark-submit …`` step with a REAL
        local spark-submit: the cluster-mode pair ``--master yarn
        --deploy-mode cluster`` is rewritten to ``--master local[2]``
        (this mock has no YARN), and every ``s3://bucket/key`` operand
        is mapped to its path in the on-disk store — so the app actually
        reads its S3 inputs and writes its S3 outputs. Costed like the
        x6 family: one spark-submit cold start per step."""
        import shutil as _shutil

        rewritten: list = []
        i = 1  # skip the 'spark-submit' marker
        while i < len(args):
            a = str(args[i])
            if a == "--master":
                rewritten += ["--master", "local[2]"]
                i += 2
                continue
            if a == "--deploy-mode":
                i += 2  # client mode implied locally
                continue
            if a.startswith(("s3://", "s3a://", "s3n://")):
                rest = a.split("://", 1)[1]
                a = os.path.join(self.s3_root, rest.replace("/", os.sep))
            rewritten.append(a)
            i += 1

        submit = _shutil.which("spark-submit") or os.path.join(
            os.environ.get("SPARK_HOME", "/opt/spark"), "bin",
            "spark-submit",
        )
        proc = subprocess.run(
            [submit] + rewritten, capture_output=True,
        )
        self._finish_step(c, step, proc.returncode, proc.stdout,
                          proc.stderr)

    def _finish_step(self, c: dict, step: dict, returncode: int,
                     stdout: bytes, stderr: bytes,
                     container_log_dir: str | None = None) -> None:
        self._write_step_logs(c, step, stdout, stderr, container_log_dir)
        step["Status"]["Timeline"]["EndDateTime"] = self.now
        if returncode == 0:
            self._set_state(step, "COMPLETED")
            return
        self._set_state(step, "FAILED")
        action = step.get("ActionOnFailure", "TERMINATE_CLUSTER")
        if action in ("TERMINATE_CLUSTER", "TERMINATE_JOB_FLOW"):
            self._set_state(
                c, "TERMINATING", "STEP_FAILURE",
                "Shut down as step failed",
            )
            for s in c["_steps"]:
                if s["Status"]["State"] == "PENDING":
                    self._set_state(s, "CANCELLED")
        elif action == "CANCEL_AND_WAIT":
            for s in c["_steps"]:
                if s["Status"]["State"] == "PENDING":
                    self._set_state(s, "CANCELLED")
        # CONTINUE: later steps still run

    def _put_log(self, c: dict, bucket: str, key: str,
                 body: bytes) -> None:
        """S3 log write, through the delivery lag when configured."""
        import base64

        if not self.log_delivery_lag_secs:
            self.s3.put_object(Bucket=bucket, Key=key, Body=body)
            return
        c.setdefault("_pending_logs", []).append({
            "due": self.now + self.log_delivery_lag_secs,
            "bucket": bucket, "key": key,
            "b64": base64.b64encode(body).decode("ascii"),
        })

    def _node_write(self, host: str, rel_path: str, body: bytes) -> None:
        full = os.path.join(self.nodes_root, host, rel_path.lstrip("/"))
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "wb") as fh:
            fh.write(body)

    def _write_step_logs(self, c: dict, step: dict, stdout: bytes,
                         stderr: bytes,
                         container_log_dir: str | None) -> None:
        # the master's disk gets the step logs the moment the step ends
        # (real EMR: /mnt/var/log/hadoop/steps/<step-id>/, uncompressed),
        # which is why the runner's SSH fetch beats waiting on S3
        master = c.get("MasterPublicDnsName")
        if master:
            node_base = "/mnt/var/log/hadoop/steps/%s" % step["Id"]
            self._node_write(master, node_base + "/stderr", stderr)
            self._node_write(master, node_base + "/stdout", stdout)
            # real EMR: the step syslog is the driver's log4j appender
            # file — same record stream the console (stderr) shows, and
            # where the reference's syslog interpreter reads counters
            self._node_write(master, node_base + "/syslog", stderr)

        log_uri = c.get("LogUri")
        bucket = prefix = None
        if log_uri:
            bucket, prefix = _parse_s3_uri(log_uri)
            base = "%s%s/steps/%s" % (
                prefix if not prefix or prefix.endswith("/")
                else prefix + "/",
                c["Id"], step["Id"],
            )
            self._put_log(c, bucket, base + "/stderr.gz",
                          gzip.compress(stderr))
            self._put_log(c, bucket, base + "/stdout.gz",
                          gzip.compress(stdout))
            self._put_log(c, bucket, base + "/syslog.gz",
                          gzip.compress(stderr))
            self._put_log(
                c, bucket, base + "/controller.gz",
                gzip.compress(
                    json.dumps({"exit_code_source": "mockemr"}).encode()
                ),
            )
        if not container_log_dir:
            return
        m = _APP_ID_RE.search(stderr.decode("utf-8", "replace"))
        app_id = m.group(0) if m else "application_unknown"
        userlogs = os.path.join(container_log_dir, "userlogs")
        if not os.path.isdir(userlogs):
            return
        # container logs land on the worker that ran them (round-robin
        # across core nodes; master if the cluster has none) and reach
        # S3 through the same delivery lag
        hosts = c.get("_core_hosts") or ([master] if master else [])
        for n, (dirpath, _, names) in enumerate(
            sorted(os.walk(userlogs))
        ):
            for name in sorted(names):
                full = os.path.join(dirpath, name)
                container = os.path.basename(dirpath)
                with open(full, "rb") as fh:
                    body = fh.read()
                if hosts:
                    self._node_write(
                        hosts[n % len(hosts)],
                        "/mnt/var/log/hadoop-yarn/containers/%s/%s/%s"
                        % (app_id, container, name),
                        body,
                    )
                if bucket is not None:
                    cprefix = "%s%s/containers/%s" % (
                        prefix if not prefix or prefix.endswith("/")
                        else prefix + "/",
                        c["Id"], app_id,
                    )
                    self._put_log(
                        c, bucket,
                        "%s/%s/%s.gz" % (cprefix, container, name),
                        gzip.compress(body),
                    )
