import os
import pathlib

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# are exercised without TPU hardware (the driver benches on the real chip).
# Note: the axon TPU plugin (sitecustomize) registers itself with priority
# and rewrites jax_platforms to "axon,cpu", so the env var alone is not
# enough — the config must be forced after importing jax.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The CLI's device probe runs in a SUBPROCESS (cli._probe_device), which
# would see the real accelerator even though this suite forces the cpu
# backend in-process — pin it off so CLI dispatch stays deterministic
# (tests exercising the decision logic monkeypatch the seams directly).
os.environ.setdefault("FOLDCOMP_TPU_LINK", "none")

# The hybrid scheduler's cold horizon would keep the device stream out of
# the tiny test jobs (by design — see EndgameGuard); tests are about the
# device path's CORRECTNESS, so force cold claims on. Guard-logic tests
# override this locally.
os.environ.setdefault("FOLDCOMP_TPU_WARMUP_EST", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

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
