"""Example: a VAE whose reconstruction term is the adaptive robust image
loss, with the loss's latent alpha/scale trained jointly.

Counterpart of the reference's robust-loss demo (reference:
third_party/robust_loss/vae.py — a TFP VAE on Celeb-A). This version is
hermetic: it trains a tiny convolutional VAE on procedurally generated
blob images, and shows the pattern that matters — the
AdaptiveImageLossFunction's latent parameters live in the same pytree as
the model weights and are optimized by the same optimizer (the thing the
reference's NLT training silently failed to do; SURVEY.md §5).

Run:  python examples/adaptive_loss_vae.py [--steps 300]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from nlt_tpu.losses.adaptive import AdaptiveImageLossFunction  # noqa: E402

RES = 32
LATENT = 16


def make_blobs(key, n):
    """Procedural 3-channel blob images in [0, 1]."""
    k1, k2, k3 = jax.random.split(key, 3)
    cx = jax.random.uniform(k1, (n, 1, 1, 3), minval=8, maxval=24)
    cy = jax.random.uniform(k2, (n, 1, 1, 3), minval=8, maxval=24)
    sigma = jax.random.uniform(k3, (n, 1, 1, 3), minval=2, maxval=6)
    ys, xs = jnp.meshgrid(jnp.arange(RES), jnp.arange(RES), indexing="ij")
    xs = xs[None, :, :, None]
    ys = ys[None, :, :, None]
    return jnp.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma ** 2))


def init_vae(key):
    ks = jax.random.split(key, 6)
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "enc_w1": glorot(ks[0], (RES * RES * 3, 128)),
        "enc_b1": jnp.zeros(128),
        "enc_mu": glorot(ks[1], (128, LATENT)),
        "enc_logvar": glorot(ks[2], (128, LATENT)),
        "dec_w1": glorot(ks[3], (LATENT, 128)),
        "dec_b1": jnp.zeros(128),
        "dec_w2": glorot(ks[4], (128, RES * RES * 3)),
        "dec_b2": jnp.zeros(RES * RES * 3),
    }


def encode(p, x):
    h = jax.nn.relu(x.reshape(x.shape[0], -1) @ p["enc_w1"] + p["enc_b1"])
    return h @ p["enc_mu"], h @ p["enc_logvar"]


def decode(p, z):
    h = jax.nn.relu(z @ p["dec_w1"] + p["dec_b1"])
    out = jax.nn.sigmoid(h @ p["dec_w2"] + p["dec_b2"])
    return out.reshape(-1, RES, RES, 3)


def main(steps=300, lr=1e-3, bs=32):
    loss_fn = AdaptiveImageLossFunction(
        (RES, RES, 3), color_space="RGB", representation="PIXEL",
        alpha_lo=0.001, alpha_hi=1.999, scale_lo=1e-4, scale_init=0.1)

    key = jax.random.PRNGKey(0)
    params = {
        "vae": init_vae(key),
        "loss": loss_fn.init_params(),  # latent alpha/scale: trained too
    }
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k_data, k_z = jax.random.split(key)
        x = make_blobs(k_data, bs)

        def elbo_loss(p):
            mu, logvar = encode(p["vae"], x)
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                k_z, mu.shape)
            recon = decode(p["vae"], z)
            nll = jnp.mean(loss_fn(p["loss"], x - recon))
            kl = -0.5 * jnp.mean(
                1 + logvar - mu ** 2 - jnp.exp(logvar))
            return nll + 1e-3 * kl

        loss, grads = jax.value_and_grad(elbo_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i % 50 == 0 or i == steps - 1:
            alpha = float(loss_fn.lossfun.alpha(params["loss"]).mean())
            scale = float(loss_fn.lossfun.scale(params["loss"]).mean())
            print("step %4d  loss %+.4f  mean alpha %.3f  mean scale %.4f"
                  % (i, float(loss), alpha, scale))
    print("Done. The adaptive loss adapted its own alpha/scale during "
          "training, checkpointable as part of `params`.")
    return params


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=300)
    main(steps=ap.parse_args().steps)
