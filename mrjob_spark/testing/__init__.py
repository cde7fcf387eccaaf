"""Shipped testing surface: executable doubles for external systems.

The reference ships its own mock cluster binaries (``tests/mockhadoop.py``,
``tests/mockssh.py``, ``tests/mock_boto3/``) so its cloud/Hadoop runners
are testable with no cluster. This package is the same idea, shipped
in-package so registry queries can use the doubles too — with one
deliberate upgrade: :mod:`mockhadoop` *executes* streaming jobs instead of
playing back canned output, so a ``-r hadoop`` run exercises the real
command rendering, wire protocols, shuffle grouping, and counter
aggregation end-to-end.
"""
