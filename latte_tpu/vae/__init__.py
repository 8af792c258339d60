from latte_tpu.vae.autoencoder_kl import (  # noqa: F401
    AutoencoderKL,
    DiagonalGaussianDistribution,
)


def make_decode_fn(vae, vae_params):
    """One jitted plain-VAE decode closure: (N, 4, h, w) latents (already
    /0.18215-scaled by the caller) -> (N, 3, H, W). Params flow in as a
    jit argument (closing them into the HLO would bake the weight tree);
    shared by sample.py / sample_many.py / LattePipeline so decode
    handling lives in exactly one place."""
    import jax

    impl = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))
    return lambda z: impl(vae_params, z)
