"""Worker-side half of dss_nlp_ingestion_spark.pbcompat.

When the driver discovered an on-disk pure-Python protobuf runtime,
it put this directory (and the runtime) on PYTHONPATH before the JVM
launched; Spark's Python workers import sitecustomize at startup, so
the relaxed minor-version gate is installed before any
``*_pb2`` module loads. No-op (and silent) everywhere else.
"""

try:  # pragma: no cover - trivial wiring, exercised via streaming tests
    from google.protobuf import runtime_version as _rv

    if not getattr(_rv.ValidateProtobufRuntimeVersion, "_dss_relaxed", False):
        _orig = _rv.ValidateProtobufRuntimeVersion

        def _relaxed(domain, major, minor, patch, suffix, location):
            try:
                _orig(domain, major, minor, patch, suffix, location)
            except _rv.VersionError:
                if major != _rv.MAJOR:
                    raise

        _relaxed._dss_relaxed = True
        _rv.ValidateProtobufRuntimeVersion = _relaxed
except Exception:  # noqa: BLE001 - never break interpreter startup
    pass
