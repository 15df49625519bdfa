"""Two-optimizer adversarial training for f-AnoGAN.

The reference ships the AnoGAN module with a train-mode tensor dict
(``AnoGAN_2019.py:98-116``: g_features / fake_images / d_real / d_fake) but
no training loop. This implements the standard f-AnoGAN objective over that
contract:

- D step: BCE(d_pred_real, 1) + BCE(d_pred_fake, 0)
- G step: reconstruction |fake - x| + adversarial BCE(d_pred_fake, 1)
         + feature-matching |d_features_fake - d_features_real|

Generator and discriminator parameters live under the flax scopes ``G`` and
``D`` of the composite module, so the split is a pytree partition — no
separate modules needed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from ..models.anogan import AnoGAN
from .losses import bce_with_logits


@dataclasses.dataclass
class AnoGANTrainer:
    learning_rate: float = 2e-4
    b1: float = 0.5
    w_rec: float = 50.0
    w_feat: float = 1.0
    seed: int = 0

    def __post_init__(self):
        self.model = AnoGAN()
        self.tx_g = optax.adam(self.learning_rate, b1=self.b1)
        self.tx_d = optax.adam(self.learning_rate, b1=self.b1)

    def init(self, sample_x):
        variables = self.model.init(jax.random.PRNGKey(self.seed), sample_x)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        return (
            {"params": params, "batch_stats": stats},
            self.tx_g.init(params["G"]),
            self.tx_d.init(params["D"]),
        )

    def _forward(self, params, stats, x, train):
        variables = {"params": params, "batch_stats": stats}
        if not train:
            out = self.model.apply(variables, x, train=False, mode="train")
            return out, {"batch_stats": stats}
        return self.model.apply(
            variables, x, train=True, mode="train", mutable=["batch_stats"]
        )

    def make_train_step(self):
        def d_loss_fn(d_params, g_params, stats, x):
            params = {"G": g_params, "D": d_params}
            out, mutated = self._forward(params, stats, x, True)
            real = bce_with_logits(
                out["d_pred_real"], jnp.ones_like(out["d_pred_real"])
            )
            fake = bce_with_logits(
                out["d_pred_fake"], jnp.zeros_like(out["d_pred_fake"])
            )
            return real + fake, mutated

        def g_loss_fn(g_params, d_params, stats, x):
            params = {"G": g_params, "D": d_params}
            out, mutated = self._forward(params, stats, x, True)
            rec = jnp.mean(jnp.abs(out["fake_images"] - x))
            adv = bce_with_logits(
                out["d_pred_fake"], jnp.ones_like(out["d_pred_fake"])
            )
            feat = jnp.mean(
                jnp.abs(out["d_features_fake"] - out["d_features_real"])
            )
            loss = self.w_rec * rec + adv + self.w_feat * feat
            return loss, (mutated, rec)

        @jax.jit
        def step(variables, opt_g, opt_d, x):
            params, stats = variables["params"], variables["batch_stats"]

            (d_loss, mutated), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(params["D"], params["G"], stats, x)
            upd, opt_d = self.tx_d.update(d_grads, opt_d, params["D"])
            d_params = optax.apply_updates(params["D"], upd)
            stats = mutated["batch_stats"]

            (g_loss, (mutated, rec)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(params["G"], d_params, stats, x)
            upd, opt_g = self.tx_g.update(g_grads, opt_g, params["G"])
            g_params = optax.apply_updates(params["G"], upd)
            stats = mutated["batch_stats"]

            new_vars = {"params": {"G": g_params, "D": d_params},
                        "batch_stats": stats}
            return new_vars, opt_g, opt_d, {
                "d_loss": d_loss, "g_loss": g_loss, "rec": rec,
            }

        return step
