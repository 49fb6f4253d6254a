"""bloomfiltertrie_tpu — TPU-native colored de Bruijn graph indexing engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Bloom
Filter Trie (Holley, Wittler, Stoye 2016; reference C implementation at
GuillaumeHolley/BloomFilterTrie): incremental k-mer insertion with color
annotations, Bloom-accelerated membership, branching-vertex detection,
neighbor traversal, extraction, marking, save/load — over sorted packed
k-mer tensors instead of a pointer-chasing burst trie, prefix-sharded across
TPU meshes.
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # The container's sitecustomize registers the axon TPU plugin and pins
    # jax_platforms at interpreter start, silently overriding the standard
    # JAX_PLATFORMS env var; re-apply it before anything can initialize the
    # backend (same trick as tests/conftest.py) so CPU-pinned runs stay off
    # the single-chip TPU tunnel.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        import warnings as _warnings

        _warnings.warn(
            f"JAX_PLATFORMS={_os.environ['JAX_PLATFORMS']!r} could not be "
            "applied; the JAX backend was already initialized before "
            "bloomfiltertrie_tpu was imported, so this run stays on the "
            "platform chosen at interpreter start (possibly the single "
            "shared TPU chip). Import bloomfiltertrie_tpu (or set the pin) "
            "before any jax computation.",
            RuntimeWarning, stacklevel=2)

from bloomfiltertrie_tpu.config import BFTConfig
from bloomfiltertrie_tpu.models.cdbg import BFTAnnotation, ColoredDBG

__version__ = "0.1.0"
__all__ = ["BFTConfig", "ColoredDBG", "BFTAnnotation", "__version__"]
