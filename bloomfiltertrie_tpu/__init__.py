"""bloomfiltertrie_tpu — TPU-native colored de Bruijn graph indexing engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Bloom
Filter Trie (Holley, Wittler, Stoye 2016; reference C implementation at
GuillaumeHolley/BloomFilterTrie): incremental k-mer insertion with color
annotations, Bloom-accelerated membership, branching-vertex detection,
neighbor traversal, extraction, marking, save/load — over sorted packed
k-mer tensors instead of a pointer-chasing burst trie, prefix-sharded across
TPU meshes.
"""

from bloomfiltertrie_tpu.config import BFTConfig
from bloomfiltertrie_tpu.models.cdbg import BFTAnnotation, ColoredDBG

__version__ = "0.1.0"
__all__ = ["BFTConfig", "ColoredDBG", "BFTAnnotation", "__version__"]
