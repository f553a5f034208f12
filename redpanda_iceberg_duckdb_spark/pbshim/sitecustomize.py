"""Worker-side environment shim for Spark 4 transformWithState.

The transformWithState Python workers speak protobuf to the JVM state
server (pyspark/sql/streaming/proto/StateMessage_pb2.py), but this
container ships no ``protobuf`` wheel and pip installs are unavailable.
The box's google-cloud-sdk vendors a pure-python protobuf runtime; this
sitecustomize — placed on the worker PYTHONPATH by
streaming.dedup_tws.enable_protobuf_shim — grafts that runtime in.
Strictly a no-op when a real protobuf install is importable, so the same
code runs unchanged in a properly provisioned cluster image.
"""
import os
import sys

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _protobuf_ok() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


if not _protobuf_ok() and os.path.isdir(os.path.join(_GAE, "google",
                                                     "protobuf")):
    sys.path.append(_GAE)  # append: never shadow a real site-packages
    # Spark python workers carry spark-core.jar on sys.path, whose
    # google/ resource dir imports as an EMPTY namespace package that
    # shadows later path entries — graft the SDK portion onto it.
    _g = sys.modules.get("google")
    if _g is not None and getattr(_g, "__path__", None) is not None:
        _p = os.path.join(_GAE, "google")
        if _p not in list(_g.__path__):
            _g.__path__.append(_p)
    sys.modules.pop("google.protobuf", None)
    try:
        from google.protobuf import runtime_version as _rv
        # The vendored runtime reports 6.32.0-dev; pyspark 4.1.2's
        # StateMessage_pb2 gencode pins 6.33. One pure-python minor
        # behind — relax the advertised version so the gencode loads.
        if (_rv.MAJOR, _rv.MINOR) == (6, 32):
            _rv.MINOR, _rv.PATCH, _rv.SUFFIX = 33, 0, ""
    except ImportError:
        pass
