"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's no-hardware CI story (``SKIP_CUDA=1 ctest``,
reference ``.travis.yml:15-21``): the whole suite must pass without a TPU.
We force the CPU platform and fake 8 local devices so every sharding test
exercises real multi-device code paths. Must run before jax initializes.
"""

import os

# Force-override: the session environment pins JAX_PLATFORMS to the real
# TPU tunnel; tests must run hermetically on host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_enable_fast_math" not in _flags:
    # IEEE-exact f32 division so similarity scores (small-int ratios) are
    # correctly rounded, matching the reference's CUDA float division.
    _flags += " --xla_cpu_enable_fast_math=false"
os.environ["XLA_FLAGS"] = _flags.strip()

import jax  # noqa: E402

# The environment's sitecustomize registers an "axon" PJRT plugin that points
# at the real TPU tunnel and force-overrides jax_platforms to "axon,cpu",
# ignoring the env var set above. Pin the config back to CPU *after* importing
# jax (backends are not initialized yet), or the whole suite silently runs on
# (and serializes over) the remote TPU.
jax.config.update("jax_platforms", "cpu")

# Cache compilations on disk so repeated suite runs skip XLA compile time.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_FSIM = "/root/reference/test/small.fsim"


@pytest.fixture(scope="session")
def reference_fixture_path():
    """Path to the reference repo's golden fixture, if mounted."""
    if not os.path.exists(REFERENCE_FSIM):
        pytest.skip("reference small.fsim fixture not available")
    return REFERENCE_FSIM


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xF1D0)


def random_fingerprint_data(rng, count=100, bitcount=1024, density=0.1, dbkey=""):
    """Synthetic FingerprintData with ~density bits set per fingerprint."""
    from gpusimilarity_tpu.utils.fsim import FingerprintData

    bits = rng.random((count, bitcount)) < density
    packed = np.packbits(bits, axis=1, bitorder="little")
    smiles = [f"C{'C' * (i % 7)}N{i}".encode() for i in range(count)]
    ids = [f"TEST{i:08d}".encode() for i in range(count)]
    return FingerprintData(
        dbkey=dbkey, bitcount=bitcount, fingerprints=packed, smiles=smiles, ids=ids
    )


@pytest.fixture()
def small_synthetic(rng):
    return random_fingerprint_data(rng)
