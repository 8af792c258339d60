from latte_tpu.vae.autoencoder_kl import (  # noqa: F401
    AutoencoderKL,
    DiagonalGaussianDistribution,
)
