"""Persistent caches: XLA compilation + coverage certificates.

TPU compiles of the sprint programs through the axon service can take
minutes for some shapes (CPU compiles the same programs in ~2 s — the
cost is in the TPU backend passes).  A persistent on-disk cache makes
every compile a one-time cost across processes and driver rounds.

The coverage-certificate cache plays the same role for the host-side
covering-lattice proofs (fields/expansion.validate_near_k and
validate_cube_candidates): the certified bound depends only on the
dipole positions and the reach radius, both fully deterministic, so the
~3 s lattice sweep is a one-time cost per scene rather than a per-run
tax on the CLI's wall-clock budget.
"""

import hashlib
import os
import tempfile


def _default_dir() -> str:
    return os.environ.get(
        "MRI_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))


def enable_compile_cache(path: str | None = None) -> str:
    import jax

    path = path or _default_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Persist EVERYTHING: through the axon tunnel even a trivial
    # convert_element_type/reshape costs ~0.4 s of compile RPC, and a CLI
    # startup dispatches a dozen of them — with the default 1 s threshold
    # none were ever cached, so every process re-paid ~5 s (measured r3)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path


def certificate_get(kind: str, key_bytes: bytes) -> int | None:
    """Look up a previously proven integer certificate (e.g. the
    covering-lattice near-K bound) by content hash.  Returns None on any
    miss or I/O problem — the caller then recomputes the proof."""
    h = hashlib.sha256(key_bytes).hexdigest()[:32]
    path = os.path.join(_default_dir(), "certs", f"{kind}-{h}.txt")
    try:
        with open(path) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def certificate_put(kind: str, key_bytes: bytes, value: int) -> None:
    """Record a proven certificate; atomic (tmp+rename), best-effort."""
    h = hashlib.sha256(key_bytes).hexdigest()[:32]
    d = os.path.join(_default_dir(), "certs")
    try:
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d)
        with os.fdopen(fd, "w") as f:
            f.write(str(int(value)))
        os.replace(tmp, os.path.join(d, f"{kind}-{h}.txt"))
    except OSError:
        pass
