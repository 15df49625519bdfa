"""Synthetic trained-accuracy A/B #2: ReLayNet + class-weighted Dice+CE.

BASELINE config #2 is "ReLayNet 8-layer + fluid joint segmentation with
class-weighted Dice loss". This mirrors ``test_dice_parity_ab`` for that
config: the reference torch ReLayNet
(`/root/reference/SOTAS/Lesions_Segment/ReLayNet_2017.py:21-116`) and the
Flax ReLayNet train from the SAME imported initial weights on IDENTICAL
synthetic fluid volumes, batch order, Adam schedule, and the SAME
class-weighted Dice+CE loss — the trainer's actual default path
(``training/losses.dice_ce_loss``) vs a numerically identical torch
re-statement — and must reach the same final validation macro-Dice.

Layer/class count is scaled down (4 layers + fluid + bg = 6 classes at
64^2) so both frameworks converge on CPU test budgets; the loss math and
the joint layers+fluid task shape are the config-#2 ones.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu import get_model
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
    SyntheticOCTConfig,
    synth_batch,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.losses import (
    dice_ce_loss,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
    import_torch_state,
)
from reference_loader import load_reference

pytestmark = pytest.mark.slow

H = W = 64
NUM_LAYERS = 4
NC = NUM_LAYERS + 2  # background + layers + fluid
FEATURES = 16
EPOCHS = 16
BATCH = 8
LR = 2e-3
# class-weighted: background down-weighted, fluid up-weighted (the
# ReLayNet-paper-style emphasis on thin layers + lesions)
CLASS_W = np.asarray([0.3] + [1.0] * NUM_LAYERS + [2.0], np.float32)
EPS = 1e-7


def _dataset(n_train=32, n_val=16):
    cfg = SyntheticOCTConfig(height=H, width=W, num_layers=NUM_LAYERS,
                             fluid=True, seed=11)
    assert cfg.num_classes == NC
    xs, ys = [], []
    for i in range(-(-(n_train + n_val) // 16)):
        x, y = synth_batch(jax.random.fold_in(jax.random.PRNGKey(5), i),
                           16, cfg)
        xs.append(np.asarray(x))
        ys.append(np.asarray(y))
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    return (x[:n_train], y[:n_train]), (x[n_train:], y[n_train:])


def _macro_dice(pred, lab):
    scores = []
    for c in range(NC):
        gt = lab == c
        if not gt.any():
            continue
        pr = pred == c
        inter = (gt & pr).sum()
        scores.append(2.0 * inter / (gt.sum() + pr.sum() + 1e-7))
    return float(np.mean(scores))


def _torch_dice_ce(logits, labels, class_w):
    """torch re-statement of ``losses._dice_ce_core`` (same eps/reductions)."""
    logp = torch.log_softmax(logits, dim=1)
    probs = torch.exp(logp)
    onehot = torch.nn.functional.one_hot(labels, NC).permute(0, 3, 1, 2)
    onehot = onehot.to(logits.dtype)
    ll = (logp * onehot).sum(1)
    w = class_w[labels]
    ce = -(ll * w).sum() / w.sum().clamp_min(EPS)
    inter = (probs * onehot).sum((0, 2, 3))
    denom = probs.sum((0, 2, 3)) + onehot.sum((0, 2, 3))
    dice = (2.0 * inter + EPS) / (denom + EPS)
    dice_term = 1.0 - (dice * class_w).sum() / class_w.sum().clamp_min(EPS)
    return dice_term + ce


def _train_torch(model, train, val):
    (xt, yt), (xv, yv) = train, val
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    class_w = torch.from_numpy(CLASS_W)
    model.train()
    for _ in range(EPOCHS):
        for i in range(0, len(xt), BATCH):
            xb = torch.from_numpy(xt[i : i + BATCH].transpose(0, 3, 1, 2))
            yb = torch.from_numpy(yt[i : i + BATCH]).long()
            opt.zero_grad()
            loss = _torch_dice_ce(model(xb), yb, class_w)
            loss.backward()
            opt.step()
    model.eval()
    with torch.no_grad():
        pred = model(
            torch.from_numpy(xv.transpose(0, 3, 1, 2))
        ).argmax(1).numpy()
    return _macro_dice(pred, yv)


def _train_flax(model, variables, train, val):
    import optax

    (xt, yt), (xv, yv) = train, val
    tx = optax.adam(LR)
    params = variables["params"]
    stats = variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, xb, yb):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": stats}, xb, train=True,
                mutable=["batch_stats"],
            )
            loss = dice_ce_loss(logits, yb, class_weights=CLASS_W,
                                dice_weight=1.0)
            return loss, upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state

    for _ in range(EPOCHS):
        for i in range(0, len(xt), BATCH):
            params, stats, opt_state = step(
                params, stats, opt_state,
                jnp.asarray(xt[i : i + BATCH]),
                jnp.asarray(yt[i : i + BATCH]),
            )
    logits = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(xv),
        train=False,
    )
    pred = np.asarray(jnp.argmax(logits, -1))
    return _macro_dice(pred, yv)


def test_relaynet_weighted_dice_ce_ab():
    ref = load_reference("SOTAS/Lesions_Segment/ReLayNet_2017.py",
                         "ref_relay_ab")
    train, val = _dataset()

    torch.manual_seed(0)
    tm = ref.ReLayNet(in_channels=1, num_classes=NC, num_filters=FEATURES)

    fm = get_model("relaynet", num_classes=NC, num_filters=FEATURES)
    variables = fm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 1), jnp.float32))
    variables = import_torch_state(
        variables, tm.state_dict(),
        transposed=lambda n: "upconv" in n,
    )

    # same starting loss (sanity that loss statements agree numerically)
    xb, yb = train[0][:4], train[1][:4]
    with torch.no_grad():
        tm.eval()
        l_t = float(_torch_dice_ce(
            tm(torch.from_numpy(xb.transpose(0, 3, 1, 2))),
            torch.from_numpy(yb).long(), torch.from_numpy(CLASS_W),
        ))
    logits = fm.apply(dict(variables), jnp.asarray(xb), train=False)
    l_f = float(dice_ce_loss(logits, jnp.asarray(yb), class_weights=CLASS_W,
                             dice_weight=1.0))
    assert abs(l_t - l_f) < 1e-3, (l_t, l_f)

    dice_torch = _train_torch(tm, train, val)
    dice_flax = _train_flax(fm, dict(variables), train, val)

    print(f"\nReLayNet weighted-Dice+CE A/B: "
          f"torch={dice_torch:.4f} flax={dice_flax:.4f}")
    assert dice_torch > 0.55, dice_torch
    assert dice_flax > 0.55, dice_flax
    assert abs(dice_torch - dice_flax) < 0.06, (dice_torch, dice_flax)
