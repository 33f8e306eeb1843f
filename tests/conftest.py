from __future__ import annotations

import os
import shutil
import sys

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

#: Host locations that ship a bundled pure-python ``google.protobuf``
#: runtime even when none is pip-installed (the google-cloud-sdk
#: vendors one). Used by :func:`_bootstrap_protobuf` below.
_PB_SOURCE_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf",
)


def _bootstrap_protobuf() -> None:
    """Stage a python protobuf runtime for the TWS driver worker
    (VERDICT r11 item #3). ``transformWithStateInPandas`` spawns a
    separate Python worker that speaks Spark's StateMessage protobuf
    protocol; this sandbox has no pip-installed ``google.protobuf``
    and installs are off-limits, but the host's google-cloud-sdk
    bundles a modern (6.x) pure-python runtime. Copy it to a scratch
    dir, widen its gencode check from exact-minor to same-major
    (protobuf wire format is stable within a major; Spark 4.1 ships
    gencode 6.33 vs the bundle's 6.32 runtime), and export it on
    PYTHONPATH — which MUST happen before the first SparkSession: the
    JVM inherits this process's env at gateway launch and the TWS
    worker inherits the JVM's, so a late export never reaches the
    worker. No-op when a real protobuf is already importable or no
    bundle exists (the TWS test then keeps its env-gated skip)."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    src = next((c for c in _PB_SOURCE_CANDIDATES if os.path.isfile(os.path.join(c, "runtime_version.py"))), None)
    if src is None:
        return
    dst_root = "/tmp/spark_graft_pb_runtime"
    marker = os.path.join(dst_root, "google", "protobuf", "runtime_version.py")
    if not os.path.isfile(marker):
        # pid-unique staging: two pytest processes bootstrapping at
        # once must never rmtree/copytree the same staging tree (a
        # shared .tmp let one delete the other's partial copy mid-
        # copytree, or double-append the shim); only the atomic final
        # rename can race, and that race is handled below.
        tmp = f"{dst_root}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.join(tmp, "google"))
        open(os.path.join(tmp, "google", "__init__.py"), "w").close()
        shutil.copytree(
            src,
            os.path.join(tmp, "google", "protobuf"),
            ignore=shutil.ignore_patterns("blaze-out", "pyext", "net", "third_party"),
        )
        with open(os.path.join(tmp, "google", "protobuf", "runtime_version.py"), "a") as fh:
            fh.write(
                "\n\n# spark-graft test-env shim: accept newer gencode MINORS within the\n"
                "# same protobuf major (wire format is stable within a major); the\n"
                "# strict check would reject Spark's 6.33 gencode on this 6.32 runtime.\n"
                "_STRICT_VALIDATE = ValidateProtobufRuntimeVersion\n\n\n"
                "def ValidateProtobufRuntimeVersion(gencode_domain, gencode_major, gencode_minor,\n"
                "                                   gencode_patch, gencode_suffix, location):\n"
                "    if gencode_major == MAJOR:\n"
                "        return\n"
                "    _STRICT_VALIDATE(gencode_domain, gencode_major, gencode_minor,\n"
                "                     gencode_patch, gencode_suffix, location)\n"
            )
        shutil.rmtree(dst_root, ignore_errors=True)
        try:
            os.rename(tmp, dst_root)
        except OSError:
            # concurrent pytest process won the staging race — use its copy
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isfile(marker):
                return
    sys.path.insert(0, dst_root)
    old = os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = dst_root + (os.pathsep + old if old else "")


_bootstrap_protobuf()

from gmall_realtime2021_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gmall-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
