"""A just-enough ``boto3`` over the EXECUTING mock EMR/S3 service.

Purpose: run boto3-speaking code that we did NOT write — most notably
the REFERENCE's own ``EMRJobRunner`` — against
:class:`mrjob_spark.testing.mockemr.MockEMRService`, for differential
tests proving the mock is a faithful-enough EMR for the reference to
run on unmodified. Put this package's parent directory
(``mrjob_spark/testing/fakeboto3``) on ``PYTHONPATH`` and set
``MOCK_EMR_BASE_DIR`` to the service root; ``import boto3`` then
resolves here and every client/resource speaks to the on-disk mock
(whose state persists across processes by design).

Coverage is exactly the surface ``mrjob/emr.py`` + ``mrjob/fs/s3.py``
exercise in a non-pooled job run: ``client('emr')`` (run_job_flow /
add_job_flow_steps / describe_cluster / describe_step / add_tags /
list_* / terminate_job_flows), ``client('s3')`` (head_bucket /
create_bucket / get_bucket_location / list_buckets), and
``resource('s3')`` (Bucket.objects.filter, Object get/put/delete/
upload_file/e_tag/content_length). Errors surface as real-shaped
``botocore.exceptions.ClientError`` so callers' except clauses and
retry classifiers behave as on AWS. ``client('iam')`` maps to the
mock's account-level role store, so the reference's own
``mrjob/iam.py`` get-or-create path runs unmodified (list_roles /
create_role / attach_role_policy / list_attached_role_policies /
list_instance_profiles / create_instance_profile /
add_role_to_instance_profile, Marker-paginated); ``client('ec2')``
serves ``describe_images`` for base-AMI discovery.
"""

from __future__ import annotations

import hashlib
import io
import os

from botocore.exceptions import ClientError

#: mock error message prefixes → (Code, HTTPStatus)
_ERROR_SHAPES = {
    "NoSuchBucket": ("NoSuchBucket", 404),
    "NoSuchKey": ("NoSuchKey", 404),
    "no such cluster": ("InvalidRequestException", 400),
    "EntityAlreadyExists": ("EntityAlreadyExists", 409),
    "NoSuchEntity": ("NoSuchEntity", 404),
}


def _service():
    from mrjob_spark.testing.mockemr import MockEMRService

    base = os.environ.get("MOCK_EMR_BASE_DIR")
    if not base:
        raise RuntimeError(
            "fake boto3 needs MOCK_EMR_BASE_DIR pointing at a"
            " MockEMRService root"
        )
    return MockEMRService(base, tick_secs=float(
        os.environ.get("MOCK_EMR_TICK_SECS", "10")
    ))


def _translate(ex: Exception, op: str) -> ClientError:
    msg = str(ex)
    for prefix, (code, status) in _ERROR_SHAPES.items():
        if msg.startswith(prefix):
            return ClientError(
                {"Error": {"Code": code, "Message": msg,
                           "HTTPStatusCode": status},
                 "ResponseMetadata": {"HTTPStatusCode": status}},
                op,
            )
    return ClientError(
        {"Error": {"Code": "ValidationException", "Message": msg,
                   "HTTPStatusCode": 400},
         "ResponseMetadata": {"HTTPStatusCode": 400}},
        op,
    )


class _Paginator:
    """boto3-shaped paginator over a Marker-style API method (the mock
    returns complete pages, so this usually yields once — but it honors
    Marker if a method ever returns one)."""

    def __init__(self, fn):
        self._fn = fn

    def paginate(self, **kwargs):
        marker = None
        while True:
            if marker:
                kwargs["Marker"] = marker
            page = self._fn(**kwargs)
            yield page
            marker = page.get("Marker") if isinstance(page, dict) else None
            if not marker:
                return


def _datetimes(obj):
    """Recursively convert the mock's epoch-float ``*DateTime`` fields to
    aware datetimes — the shape real boto3 returns. The reference's
    billing/usage tools (audit_usage) do datetime arithmetic on Timeline
    fields; floats would crash them."""
    from datetime import datetime, timezone

    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if (k.endswith("DateTime") and isinstance(v, (int, float))
                    and not isinstance(v, bool)):
                out[k] = datetime.fromtimestamp(v, timezone.utc)
            else:
                out[k] = _datetimes(v)
        return out
    if isinstance(obj, list):
        return [_datetimes(v) for v in obj]
    return obj


class _Translating:
    """Proxy that re-raises the mock's errors as ClientError."""

    def __init__(self, inner):
        self._inner = inner

    def get_paginator(self, operation_name):
        return _Paginator(getattr(self, operation_name))

    def __getattr__(self, name):
        from mrjob_spark.testing.mockemr import MockClientError

        attr = getattr(self._inner, name)
        if not callable(attr):
            return attr

        def call(*args, **kwargs):
            try:
                result = attr(*args, **kwargs)
            except MockClientError as ex:
                raise _translate(ex, name) from None
            return _datetimes(result)

        return call


class _S3ClientExtras:
    """Client-level S3 calls the mock's raw client lacks."""

    def __init__(self, svc):
        self._svc = svc
        self._raw = svc.s3_client()

    def get_bucket_location(self, Bucket):
        self.head_bucket(Bucket=Bucket)
        return {"LocationConstraint": None}

    def list_buckets(self):
        root = self._raw.root
        names = sorted(
            n for n in os.listdir(root)
            if os.path.isdir(os.path.join(root, n))
        )
        return {"Buckets": [{"Name": n} for n in names]}

    def __getattr__(self, name):
        return getattr(_Translating(self._raw), name)


def client(service_name, **_kwargs):
    svc = _service()
    if service_name == "emr":
        return _Translating(svc.emr_client())
    if service_name == "s3":
        return _S3ClientExtras(svc)
    if service_name == "iam":
        return _Translating(svc.iam_client())
    if service_name == "ec2":
        return _Translating(svc.ec2_client())
    raise NotImplementedError(
        "fake boto3 models 'emr', 's3', 'iam' and 'ec2' (got %r)"
        % service_name
    )


# ---------------------------------------------------------------------
# the s3 RESOURCE surface (mrjob/fs/s3.py drives uploads/listings/cat
# through resource objects, not the client)
# ---------------------------------------------------------------------


class _ObjectSummary:
    def __init__(self, bucket: "_Bucket", entry: dict):
        self._bucket = bucket
        self.key = entry["Key"]
        self.size = entry["Size"]
        self.last_modified = entry["LastModified"]

    def delete(self):
        return self._bucket._client.delete_object(
            Bucket=self._bucket.name, Key=self.key
        )


class _Objects:
    def __init__(self, bucket: "_Bucket"):
        self._bucket = bucket

    def filter(self, Prefix=""):
        from mrjob_spark.dataflow.objectstore import iter_objects

        for entry in iter_objects(
            self._bucket._client, self._bucket.name, Prefix
        ):
            yield _ObjectSummary(self._bucket, entry)

    def all(self):
        return self.filter()


class _Object:
    def __init__(self, bucket: "_Bucket", key: str):
        self._bucket = bucket
        self.bucket_name = bucket.name
        self.key = key

    def _read(self) -> bytes:
        resp = self._bucket._client.get_object(
            Bucket=self.bucket_name, Key=self.key
        )
        return resp["Body"].read()

    def get(self):
        try:
            body = self._read()
        except Exception as ex:
            raise _translate(ex, "GetObject") from None
        return {"Body": io.BytesIO(body), "ContentLength": len(body)}

    def put(self, Body=b"", **_):
        data = Body if isinstance(Body, bytes) else Body.read()
        return self._bucket._client.put_object(
            Bucket=self.bucket_name, Key=self.key, Body=data
        )

    def upload_file(self, Filename, Config=None, ExtraArgs=None):
        return self._bucket._client.upload_file(
            Filename=Filename, Bucket=self.bucket_name, Key=self.key
        )

    def delete(self):
        return self._bucket._client.delete_object(
            Bucket=self.bucket_name, Key=self.key
        )

    @property
    def e_tag(self) -> str:
        # real S3: md5 of the body for single-part uploads
        return '"%s"' % hashlib.md5(self.get()["Body"].read()).hexdigest()

    @property
    def content_length(self) -> int:
        return self.get()["ContentLength"]


class _Bucket:
    def __init__(self, resource: "_S3Resource", name: str):
        self._client = resource.meta.client
        self.name = name
        self.objects = _Objects(self)

    def Object(self, key):
        return _Object(self, key)


class _Meta:
    def __init__(self, client):
        self.client = client


class _S3Resource:
    def __init__(self, svc):
        self.meta = _Meta(_S3ClientExtras(svc))

    def Bucket(self, name):
        return _Bucket(self, name)


def resource(service_name, **_kwargs):
    if service_name != "s3":
        raise NotImplementedError(
            "fake boto3 models the 's3' resource only"
        )
    return _S3Resource(_service())
