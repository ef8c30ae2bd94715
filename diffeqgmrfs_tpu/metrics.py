"""Quality metrics (analog of `/root/reference/src/metrics.jl`)."""

import jax.numpy as jnp


def rmse(pred, soln):
    pred, soln = jnp.asarray(pred), jnp.asarray(soln)
    return jnp.sqrt(jnp.mean((pred - soln) ** 2))


def max_err(pred, soln):
    pred, soln = jnp.asarray(pred), jnp.asarray(soln)
    return jnp.max(jnp.abs(pred - soln))


def rel_err(pred, soln):
    pred, soln = jnp.asarray(pred), jnp.asarray(soln)
    return jnp.linalg.norm(pred - soln) / jnp.linalg.norm(soln)
