"""rnet — TPU-native Relation Networks for CLEVR.

A ground-up JAX/XLA/Pallas/pjit framework with the full capabilities of the
PyTorch reference ``mesnico/RelationNetworks-CLEVR`` (see SURVEY.md): Relation
Networks (Santoro et al. 2017, arXiv:1706.01427) trained and evaluated on
CLEVR, in the from-pixels and state-description variants, with mesnico's
extensions (configurable question-injection position, question inversion,
LR/batch-size doubling schedules, per-answer-class evaluation, g_theta
relational feature extraction for image retrieval).

This is NOT a port: the O(n^2) pairwise core is a fused Pallas TPU kernel
that never materializes the pair tensor in HBM, and training data-parallelizes
over a `jax.sharding.Mesh` with ICI gradient allreduce.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy public API (keeps `import rnet` free of jax initialization)
    if name == "RN":
        from .models import RN

        return RN
    if name in ("ModelConfig", "load_config", "list_models"):
        from . import config as _config

        return getattr(_config, name)
    if name == "Trainer":
        from .train.loop import Trainer

        return Trainer
    if name == "build_dictionaries":
        from .data.vocab import build_dictionaries

        return build_dictionaries
    raise AttributeError(name)
