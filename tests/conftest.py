import os
import pathlib

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# are exercised without TPU hardware (the driver benches on the real chip).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

REF_TEST_DIR = pathlib.Path(
    os.environ.get("FOLDCOMP_REF_TEST", "/root/reference/test"))


@pytest.fixture(scope="session")
def ref_test_dir():
    if not REF_TEST_DIR.is_dir():
        pytest.skip("reference test fixtures not available")
    return REF_TEST_DIR


def require_fixture(name: str) -> pathlib.Path:
    p = REF_TEST_DIR / name
    if not p.exists():
        pytest.skip(f"fixture {name} not available")
    return p
