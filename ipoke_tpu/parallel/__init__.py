from ipoke_tpu.parallel import mesh  # noqa: F401
