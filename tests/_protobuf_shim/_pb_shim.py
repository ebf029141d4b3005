"""Test-env shim: expose the container's vendored protobuf runtime.

This container has no pip-installed ``protobuf`` (and the build rules
forbid installing one), but the public Google Cloud SDK baked into the
image vendors a modern protobuf runtime (6.32) under
``platform/google_appengine``. pyspark 4.1.2's generated
``StateMessage_pb2`` (the transformWithState state-server protocol) was
built with gencode 6.33, and protobuf's ``runtime_version`` policy check
refuses any runtime older than the gencode — even a same-major,
wire-compatible one-minor gap like this.

This module (a) puts the vendored runtime on ``sys.path`` when no
protobuf is importable otherwise, and (b) relaxes ONLY the
same-major-version direction of the policy check (the major-version
guard stays). The StateMessage protocol uses plain scalar/message
fields, nothing 6.33-only, so 6.32 parses it fine.

Loaded two ways, test-env only — never imported by library code:
  * ``tests/conftest.py`` imports it in the pytest (driver) process and
    prepends this directory to ``PYTHONPATH`` before the JVM starts;
  * Spark's spawned Python workers pick it up automatically because the
    sibling ``sitecustomize.py`` (found via that PYTHONPATH) imports it
    at interpreter startup.
"""

from __future__ import annotations

import os
import sys

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _probe() -> bool:
    # Probe for a REAL protobuf runtime, not just an importable name:
    # in Spark worker processes, spark-core_*.jar sits on sys.path and
    # its internal google/protobuf/ directory makes zipimport expose an
    # EMPTY namespace package under that name (__file__ is None, no
    # modules). `import google.protobuf` succeeds on it; `descriptor`
    # does not.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _ensure_protobuf() -> bool:
    if _probe():
        return True
    if not os.path.isdir(os.path.join(_GAE, "google", "protobuf")):
        return False
    # append, not insert: never shadow a real site-packages install
    if _GAE not in sys.path:
        sys.path.append(_GAE)
    # Drop any bogus namespace-package entries cached by the failed
    # probe (or by the jar portion) so the retry resolves the regular
    # package from _GAE — a regular package anywhere on the parent
    # __path__ beats namespace portions, but only at (re)import time.
    for name in [n for n in sys.modules if n == "google" or n.startswith("google.")]:
        mod = sys.modules[name]
        if getattr(mod, "__file__", None) is None:
            del sys.modules[name]
    return _probe()


def _relax_version_check() -> None:
    try:
        from google.protobuf import runtime_version as _rv
    except ImportError:
        return
    if getattr(_rv.ValidateProtobufRuntimeVersion, "_pb_shim_lenient", False):
        return
    _orig = _rv.ValidateProtobufRuntimeVersion

    def _lenient(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location):
        try:
            _orig(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location)
        except _rv.VersionError:
            # Same-major, runtime-older-than-gencode: accept. Anything
            # crossing a major version keeps the hard failure.
            if gen_major != _rv.MAJOR:
                raise

    _lenient._pb_shim_lenient = True  # type: ignore[attr-defined]
    _rv.ValidateProtobufRuntimeVersion = _lenient


if _ensure_protobuf():
    _relax_version_check()
