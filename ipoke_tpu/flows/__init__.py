from ipoke_tpu.flows import (  # noqa: F401
    actnorm,
    attention,
    convnets,
    loss,
    macow,
    mcf,
    multistack,
    nice,
    permute,
    transformer,
    transforms,
)
