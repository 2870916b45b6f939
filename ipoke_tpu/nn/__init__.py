from ipoke_tpu.nn import core, blocks  # noqa: F401
