"""Protobuf runtime discovery for Spark-4 typed-state streaming.

``transformWithStateInPandas`` talks to the JVM state server through
protobuf messages (``pyspark.sql.streaming.proto.StateMessage_pb2``),
imported in BOTH the driver and every Python worker. Hermetic
containers often lack the ``protobuf`` pip package while still
carrying a pure-Python runtime on disk (e.g. the Google Cloud SDK
ships one). This module finds such a runtime, relaxes the
gencode/runtime MINOR-version gate when that is the only mismatch
(the wire format and the ``internal.builder`` API are stable across
minors — protobuf's own cross-version guarantee), and exports the
discovery to Spark workers via ``PYTHONPATH`` + a ``sitecustomize``
hook. Everything is best-effort: with no runtime anywhere, callers
see the same ImportError/skip as before.

Must run BEFORE the JVM launches (workers inherit the JVM's env),
which :func:`dss_nlp_ingestion_spark.session.get_spark` guarantees.
"""

from __future__ import annotations

import os
import sys

#: Candidate roots holding a pure-Python ``google/protobuf`` tree.
#: ``DSS_PROTOBUF_PATH`` (colon-separated) is consulted first so a
#: deployment can point at its own runtime without code changes.
_KNOWN_RUNTIMES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def _candidate_roots() -> list[str]:
    roots = [
        p
        for p in os.environ.get("DSS_PROTOBUF_PATH", "").split(os.pathsep)
        if p
    ]
    roots.extend(_KNOWN_RUNTIMES)
    return roots


def relax_minor_version_gate() -> None:
    """Wrap ``runtime_version.ValidateProtobufRuntimeVersion`` so a
    MINOR-version gap between gencode and runtime no longer raises;
    a MAJOR mismatch still does (those may break the builder API).
    Idempotent; a runtime without the module (protobuf < 5) needs no
    gate at all."""
    try:
        from google.protobuf import runtime_version as rv
    except ImportError:
        return
    if getattr(rv.ValidateProtobufRuntimeVersion, "_dss_relaxed", False):
        return
    orig = rv.ValidateProtobufRuntimeVersion

    def relaxed(domain, major, minor, patch, suffix, location):  # noqa: ANN001
        try:
            orig(domain, major, minor, patch, suffix, location)
        except rv.VersionError:
            if major != rv.MAJOR:
                raise

    relaxed._dss_relaxed = True  # type: ignore[attr-defined]
    rv.ValidateProtobufRuntimeVersion = relaxed


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here and in Spark workers.
    Returns True when the runtime is available (already installed, or
    discovered on disk); False when no runtime exists anywhere."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        # Already importable: if it was wired by a previous call the
        # relaxed gate is in place; a real pip install needs nothing.
        return True
    except ImportError:
        pass
    site_dir = os.path.join(os.path.dirname(__file__), "pbcompat_site")
    for root in _candidate_roots():
        if not os.path.isfile(
            os.path.join(root, "google", "protobuf", "descriptor.py")
        ):
            continue
        sys.path.append(root)
        try:
            import google.protobuf.descriptor  # noqa: F401
        except ImportError:
            sys.path.remove(root)
            continue
        relax_minor_version_gate()
        # Workers: same runtime on PYTHONPATH + the sitecustomize dir
        # that re-applies the relaxed gate at interpreter startup.
        parts = [
            p
            for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p
        ]
        for extra in (site_dir, root):
            if extra not in parts:
                parts.append(extra)
        os.environ["PYTHONPATH"] = os.pathsep.join(parts)
        return True
    return False
