"""Underwater image formation model (Sea-thru; Akkaynak & Treibitz).

The observed color at range z per channel c:

    I_c = J_c · exp(-beta_D_c(z) · z)  +  B_c · (1 - exp(-beta_B_c · z))

with the direct-attenuation coefficient modeled as a two-exponential in z:
    beta_D_c(z) = a_c·exp(b_c z) + c_c·exp(d_c z),  a,c >= 0, b,d <= 0.

Reference parity: the model/Jacobians live in imaging/backscatter.cpp and
attenuation.cpp; the initial-guess vectors are enhance.cpp:44-48 and
attenuation.hpp BetaInitialGuess1/2 (Sea-thru sites). This module provides
the forward synthesis used by tests (degrade a clean image, recover it) and
the canonical initial guesses.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Sea-thru D5 3374 defaults (enhance.cpp:44-48), channel order RGB here.
# NOTE: the reference stores BGR; we keep RGB images, so reference (b,g,r)
# vectors are reversed. Parity tests account for the flip.
B_DEFAULT = np.array([0.0559, 0.115, 0.132], dtype=np.float32)
BETA_B_DEFAULT = np.array([1.11, 0.695, 0.358], dtype=np.float32)
JP_DEFAULT = np.array([0.05, 0.05, 0.05], dtype=np.float32)
BETA_DP_DEFAULT = np.array([0.891, 1.23, 1.17], dtype=np.float32)

# beta_D(z) = a e^{bz} + c e^{dz} initial guesses (attenuation.hpp:12-29),
# packed X = [a(3), b(3), c(3), d(3)], RGB channel order (reference stores
# BGR; each 3-block is reversed here).
BETA_GUESS_1 = np.array(  # "works well for D1, D2, D3"
    [1.1, 0.77, 0.85, 0.0, -0.30, -0.38, 2.9, 2.0, 1.4, -1.6, -1.9, -2.0],
    dtype=np.float32,
)
BETA_GUESS_2 = np.array(  # "works well for D5"
    [0.26, 0.088, 0.023, -0.08, -0.051, -0.032, 1.69, 1.04, 0.025, -2.3, -2.1, -0.039],
    dtype=np.float32,
)


def beta_d_of_z(X: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """beta_D(z) per channel: (…,1)·z → (…,3). X = [a, b, c, d] packed 12."""
    a, b, c, d = X[0:3], X[3:6], X[6:9], X[9:12]
    zz = z[..., None]
    return a * jnp.exp(b * zz) + c * jnp.exp(d * zz)


def synthesize_underwater(
    clean: jnp.ndarray,
    z: jnp.ndarray,
    B: jnp.ndarray,
    beta_B: jnp.ndarray,
    beta_D_X: jnp.ndarray,
) -> jnp.ndarray:
    """Degrade a clean RGB image at ranges z with the full formation model."""
    zz = z[..., None]
    backscatter = B * (1.0 - jnp.exp(-beta_B * zz))
    direct = clean * jnp.exp(-beta_d_of_z(beta_D_X, z) * zz)
    return direct + backscatter
