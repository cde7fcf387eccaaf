"""A just-enough ``botocore`` for running boto3-speaking code against
the executing mock services (companion to the fake ``boto3`` package;
see ``fakeboto3/boto3/__init__.py`` for the contract)."""

from . import client, exceptions  # noqa: F401
