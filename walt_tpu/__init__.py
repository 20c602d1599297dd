"""walt_tpu: a TPU-native bisulfite-sequencing read mapper.

A from-scratch reimplementation of the capabilities of WALT (smithlabcode/walt,
reference layout documented in SURVEY.md) designed for TPU hardware:

- the genome hash index lives on device as packed integer arrays,
- seeding / sorted-bucket refinement / candidate verification run as batched
  fixed-shape JAX (XLA) programs with Pallas kernels on the hot path,
- reads are mapped data-parallel across a ``jax.sharding.Mesh`` of chips,
- the sequential best-hit / top-k semantics of the reference are replayed on
  host (C++ native library with a NumPy fallback) to give bit-identical
  MR/SAM/.mapstats output.

Reference behavior citations use ``path:line`` into the upstream repo, e.g.
``src/walt/mapping.cpp:224``.
"""

__version__ = "0.1.0"

from walt_tpu.hostmem import tune_malloc as _tune_malloc

_tune_malloc()

from walt_tpu.constants import SeedPattern, get_pattern  # noqa: F401
