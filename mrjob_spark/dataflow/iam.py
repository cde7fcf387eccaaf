"""IAM role bootstrap + base-AMI discovery for the EMR control plane.

A brand-new AWS account has none of the roles EMR needs, so the first
``run_job_flow`` fails with a missing-role error. The reference solves
this by creating its own roles on the fly (``mrjob/iam.py:90-170``):
before launching, it scans existing roles for one whose trust document
and attached managed policy already match what EMR needs, and only
creates a fresh ``mrjob-…`` role when nothing matches — there is no
versioning, matching IS the idempotence. This module re-expresses that
contract for the Spark engine:

* :func:`get_or_create_service_role` — the role EMR itself assumes
  (``elasticmapreduce.amazonaws.com`` trust + the managed
  ``AmazonElasticMapReduceRole`` policy);
* :func:`get_or_create_instance_profile` — the role the cluster's EC2
  instances assume, wrapped in an instance profile of the same name
  (``ec2.amazonaws.com`` trust + ``AmazonElasticMapReduceforEC2Role``).

Both documents and policy ARNs are the public shapes ``aws emr
create-default-roles`` writes (AWS's own documented defaults); the
fallback names when the IAM API itself is unreachable are the console's
``EMR_DefaultRole`` / ``EMR_EC2_DefaultRole`` (reference
``mrjob/emr.py:1271-1294``: a 403 from IAM downgrades to the default
names rather than killing the job — many accounts grant EMR but not
IAM).

At fleet scale this matters because role creation is a one-time,
account-level side effect racing across a thousand drivers: the
scan-before-create order means concurrent first-boots converge on a
handful of identical roles instead of a thousand — IAM roles are
matched by content, so duplicates are harmless and later runs always
reuse the first match.

Also here: :func:`describe_base_emr_images` (reference
``mrjob/ami.py:25-80``) — the EC2 image scan for Amazon Linux bases
suitable for building custom EMR AMIs (``image_id`` /
``CustomAmiId``), newest first.
"""

from __future__ import annotations

import json
import random
from typing import Iterator

#: trust policy for the role EMR assumes (the shape
#: `aws emr create-default-roles` writes)
SERVICE_ROLE_DOCUMENT = {
    "Version": "2008-10-17",
    "Statement": [{
        "Sid": "",
        "Effect": "Allow",
        "Principal": {"Service": "elasticmapreduce.amazonaws.com"},
        "Action": "sts:AssumeRole",
    }],
}

#: trust policy for the role the cluster's EC2 instances assume
INSTANCE_PROFILE_ROLE_DOCUMENT = {
    "Version": "2008-10-17",
    "Statement": [{
        "Sid": "",
        "Effect": "Allow",
        "Principal": {"Service": "ec2.amazonaws.com"},
        "Action": "sts:AssumeRole",
    }],
}

#: AWS-managed policies to attach (same ones the console's default
#: roles carry)
SERVICE_ROLE_POLICY_ARN = (
    "arn:aws:iam::aws:policy/service-role/AmazonElasticMapReduceRole")
INSTANCE_PROFILE_POLICY_ARN = (
    "arn:aws:iam::aws:policy/service-role/"
    "AmazonElasticMapReduceforEC2Role")

#: console/CLI default names, used when the IAM API is off-limits
FALLBACK_SERVICE_ROLE = "EMR_DefaultRole"
FALLBACK_INSTANCE_PROFILE = "EMR_EC2_DefaultRole"


def _new_role_name() -> str:
    # content, not name, is the identity — the suffix only needs to
    # avoid collisions within an account
    return "mrjob-spark-%016x" % random.getrandbits(64)


def _paginate(client, method: str, result_key: str, **kwargs) -> Iterator:
    """Walk boto3 IAM-style truncated listings (IsTruncated/Marker)."""
    while True:
        resp = getattr(client, method)(**kwargs)
        yield from resp.get(result_key) or []
        if not resp.get("IsTruncated"):
            return
        kwargs["Marker"] = resp["Marker"]


def _role_has_identity(client, role: dict, document: dict,
                       policy_arn: str) -> bool:
    """Trust document equal AND exactly the one managed policy attached
    — the reference's match rule (mrjob/iam.py:141-155)."""
    if role.get("AssumeRolePolicyDocument") != document:
        return False
    attached = client.list_attached_role_policies(
        RoleName=role["RoleName"]
    ).get("AttachedPolicies") or []
    return (len(attached) == 1
            and attached[0].get("PolicyArn") == policy_arn)


def _create_role(client, document: dict, policy_arn: str) -> str:
    name = _new_role_name()
    client.create_role(
        RoleName=name,
        AssumeRolePolicyDocument=json.dumps(document),
    )
    client.attach_role_policy(RoleName=name, PolicyArn=policy_arn)
    return name


def get_or_create_service_role(iam_client) -> str:
    """Name of a role EMR can assume, reusing any content-matching role
    in the account before creating a ``mrjob-spark-…`` one."""
    for role in _paginate(iam_client, "list_roles", "Roles"):
        if _role_has_identity(iam_client, role, SERVICE_ROLE_DOCUMENT,
                              SERVICE_ROLE_POLICY_ARN):
            return role["RoleName"]
    return _create_role(iam_client, SERVICE_ROLE_DOCUMENT,
                        SERVICE_ROLE_POLICY_ARN)


def get_or_create_instance_profile(iam_client) -> str:
    """Name of an instance profile the cluster's nodes can use. An
    existing profile matches only when it wraps exactly one role with
    the EC2 trust document + managed policy; otherwise a new role is
    created and wrapped in a same-named profile."""
    for profile in _paginate(iam_client, "list_instance_profiles",
                             "InstanceProfiles"):
        roles = profile.get("Roles") or []
        if len(roles) == 1 and _role_has_identity(
            iam_client, roles[0], INSTANCE_PROFILE_ROLE_DOCUMENT,
            INSTANCE_PROFILE_POLICY_ARN,
        ):
            return profile["InstanceProfileName"]
    name = _create_role(iam_client, INSTANCE_PROFILE_ROLE_DOCUMENT,
                        INSTANCE_PROFILE_POLICY_ARN)
    iam_client.create_instance_profile(InstanceProfileName=name)
    iam_client.add_role_to_instance_profile(
        InstanceProfileName=name, RoleName=name)
    return name


# ---------------------------------------------------------------------
# base-AMI discovery (reference mrjob/ami.py)
# ---------------------------------------------------------------------

#: stable Amazon Linux 1 HVM/EBS images — the naming convention EC2 has
#: used since late 2016; "testing"/"rc" builds have non-numeric versions
#: and fail this pattern on purpose
_BASE_IMAGE_NAME = None  # compiled lazily below


def _is_base_image_name(name: str) -> bool:
    global _BASE_IMAGE_NAME
    if _BASE_IMAGE_NAME is None:
        import re

        _BASE_IMAGE_NAME = re.compile(
            r"^amzn-ami-hvm-[\d\.]*-x86_64-ebs$")
    return bool(_BASE_IMAGE_NAME.match(name or ""))


def describe_base_emr_images(ec2_client) -> list:
    """Amazon Linux images usable as custom-AMI bases for EMR, newest
    first (reference ``mrjob/ami.py:25-80``; the published constraints:
    Amazon Linux 1, HVM, x86_64, a single standard EBS volume, stable
    version). Each element is a ``describe_images`` image dict —
    ``ImageId`` is what goes in the runner's ``image_id`` opt."""
    resp = ec2_client.describe_images(
        Owners=["amazon"],
        Filters=[
            {"Name": "architecture", "Values": ["x86_64"]},
            {"Name": "root-device-type", "Values": ["ebs"]},
            {"Name": "virtualization-type", "Values": ["hvm"]},
        ],
    )

    def usable(img: dict) -> bool:
        return (
            _is_base_image_name(img.get("Name") or "")
            # the name implies one volume, but the API doesn't promise it
            and len(img.get("BlockDeviceMappings") or []) == 1
            and bool(img.get("CreationDate"))
        )

    images = [img for img in resp.get("Images") or [] if usable(img)]
    images.sort(key=lambda img: img["CreationDate"], reverse=True)
    return images
