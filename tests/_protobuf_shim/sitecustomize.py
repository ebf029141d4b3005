"""Auto-loaded by ``site`` in every Python process whose PYTHONPATH
includes this directory (tests/conftest.py arranges that) — this is how
Spark's spawned streaming/UDF worker processes get the vendored-protobuf
shim without any library-code involvement. See ``_pb_shim`` docstring."""

try:
    import _pb_shim  # noqa: F401
except Exception:
    # Never let a shim failure break interpreter startup.
    pass

