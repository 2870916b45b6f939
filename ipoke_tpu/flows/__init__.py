from ipoke_tpu.flows import (  # noqa: F401
    actnorm,
    convnets,
    loss,
    macow,
    mcf,
    nice,
    permute,
    transformer,
    transforms,
)
