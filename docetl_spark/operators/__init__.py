from . import code_ops, gather, sample, semantic, shape  # noqa: F401
