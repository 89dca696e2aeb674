import os

# Tests run on a virtual 8-device CPU mesh (deterministic, no remote compiles);
# the real-TPU path is exercised by bench.py / __graft_entry__.py.
# XLA_FLAGS must precede jax import; the axon sitecustomize rewrites
# jax_platforms at import time, so the platform is forced via jax.config AFTER
# import (env JAX_PLATFORMS alone is overridden by the plugin registration).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ORACLE_DIR = REPO / "oracle"
ORACLE_BIN = ORACLE_DIR / "build" / "oracle_cli"
REF_SAMPLES = pathlib.Path("/root/reference/cloudini_lib/samples")


def _ensure_oracle() -> bool:
    if ORACLE_BIN.exists():
        return True
    if not pathlib.Path("/root/reference").exists():
        return False
    try:
        subprocess.run(
            ["cmake", "-B", "build", "-G", "Ninja", "."],
            cwd=ORACLE_DIR, check=True, capture_output=True,
        )
        subprocess.run(["ninja", "-C", "build"], cwd=ORACLE_DIR, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return ORACLE_BIN.exists()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """jaxlib's CPU client segfaults deterministically once a few hundred
    compiled executables accumulate in one process (reproduced at
    test_golden.py::test_v5_mode_palette with or without the native runtime,
    on an otherwise idle machine); dropping the jit caches between modules
    keeps the live-executable count bounded. Costs a few recompiles per
    module on the CPU backend."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def oracle():
    """Golden-bytes generator driving the reference C++ library."""
    if not _ensure_oracle():
        pytest.skip("reference oracle unavailable (no /root/reference or toolchain)")
    from tests.oracle_utils import Oracle

    return Oracle(str(ORACLE_BIN))


@pytest.fixture(scope="session")
def lidar_pcd():
    p = REF_SAMPLES / "lidar.pcd"
    if not p.exists():
        pytest.skip("lidar.pcd fixture unavailable")
    return str(p)


@pytest.fixture(scope="session")
def dds_message_bin():
    p = REF_SAMPLES / "dds_message.bin"
    if not p.exists():
        pytest.skip("dds_message.bin fixture unavailable")
    return str(p)
