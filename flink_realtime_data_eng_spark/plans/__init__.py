"""Relational benchmark plans over the driver's TPC-H-ish star schema."""

from . import relational  # noqa: F401
