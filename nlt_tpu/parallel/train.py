"""Sharded train/eval steps: the hot path.

Replaces the reference's distributed_train_step/vali_step (reference:
nlt/trainvali.py:267-325): instead of strategy.run + per-replica loss
scaling + explicit strategy.reduce, the WHOLE step (forward, loss,
backward, Adam update) is one jitted XLA program over the mesh; GSPMD
inserts the gradient all-reduce (psum over 'data'/'tile') and the loss
mean is globally correct because the batch is a global sharded array —
no tf.nn.compute_average_loss bookkeeping needed.

The training state is a plain pytree {params, opt_state, step}; the
optimizer is optax (AMSGrad + optional global-norm clipping, matching
Adam(amsgrad=True, clipnorm=mgm), reference: trainvali.py:122-127).
State is donated so parameter buffers are updated in place in HBM.
"""

import jax
import jax.numpy as jnp
import optax

from ..networks import elements



def make_optimizer(lr, mgm=-1.0):
    """AMSGrad with optional max-gradient-norm clipping
    (reference: nlt/trainvali.py:122-127)."""
    tx = optax.amsgrad(learning_rate=lr)
    if mgm and mgm > 0:
        tx = optax.chain(optax.clip_by_global_norm(mgm), tx)
    return tx


def init_state(model, tx, key, ema_decay=0.0):
    params = model.init_params(key)
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    if ema_decay and ema_decay > 0:
        # Exponential moving average of params, updated by the train
        # step and preferred at eval/serve time (ema_decay config key).
        # Lives in the state pytree, so it is checkpointed/restored.
        state["ema_params"] = jax.tree.map(jnp.array, params)
    return state


def ema_params_of(state):
    """The parameters to evaluate/serve with: the EMA if the state
    carries one, else the raw params."""
    return state.get("ema_params", state["params"])


def make_train_step(model, tx, mesh=None, tile_spatial=False,
                    with_vis=True, cached_statics=False, grad_accum=1,
                    nan_guard=False, ema_decay=0.0):
    """Returns train_step(state, batch) -> (state, loss, to_vis).

    With cached_statics, the signature is train_step(state, batch,
    statics) where statics = {'feats': ..., 'products': ...} from
    make_static_extractor: precomputed static ground-truth loss
    features (LPIPS AlexNet taps — models/base.extract_gt_feats) and
    params-independent warp products (models/base.static_products) are
    reused instead of recomputed, with identical loss and gradients.

    grad_accum > 1 splits the batch into that many microbatches and
    runs them sequentially under lax.scan, averaging gradients before
    the single optimizer update — the same gradient as the full batch
    (mean over examples is grouping-invariant; only the f32 summation
    order differs). This is how to scale the per-chip batch past the
    resampler's gather-table cliff (RESULTS.md: XLA's flat row gather
    degrades 6.5 -> 22.5 ns/row once a take exceeds ~1.5M rows, so a
    bs-8 512^2 step COLLAPSES to 110 ms where two scanned bs-4
    microbatches stay on the fast path), without the in-take chunking
    that crashed this environment's TPU worker (ops/resample.py).

    nan_guard skips the parameter/optimizer update (params and
    opt_state keep their previous values; step still increments) when
    the loss or any gradient is non-finite — one bad batch cannot
    poison a long production run. The reference has no such failure
    detection in its train loop (SURVEY.md §5); the non-finite loss
    still reaches the scalar logs, so the event is visible."""

    stochastic = (hasattr(model, "has_stochastic_loss")
                  and model.has_stochastic_loss())

    def loss_fn(params, batch, statics, step, micro_i):
        gt_feats = statics["feats"] if statics else None
        products = (statics["products"] or None) if statics else None
        apply_kwargs = {"statics": products} if products else {}
        # BatchNorm layers (norm = batch) normalize by batch stats in
        # training and record them here; the step EMA-merges them into
        # the params' moving-stats leaves (Keras BN semantics,
        # reference: nlt/networks/elements.py:51-66). No-op when the
        # model has no BN layers (taps stays {}).
        with elements.collect_bn_stats() as bn_taps:
            pred, gt, kwargs, to_vis = model.apply(
                params, batch, "train", **apply_kwargs)
        bn_taps = dict(bn_taps)
        kwargs["keep_batch"] = True
        if gt_feats:
            kwargs["gt_feats"] = gt_feats
        if stochastic:
            # Fresh ensemble sample per step (E-LPIPS); identical
            # across replicas since step is replicated. Each
            # microbatch folds its index in for an independent sample.
            key = jax.random.fold_in(jax.random.PRNGKey(17), step)
            if grad_accum > 1:
                key = jax.random.fold_in(key, micro_i)
            kwargs["loss_key"] = key
        per_example = model.compute_loss(params, pred, gt, **kwargs)
        return jnp.mean(per_example), (to_vis, bn_taps)

    def train_step(state, batch, statics=None):
        if grad_accum > 1:
            def split(x):
                assert x.shape[0] % grad_accum == 0, (
                    f"batch dim {x.shape[0]} not divisible by "
                    f"grad_accum={grad_accum}")
                # Strided split (microbatch i = examples [i::N]): with
                # the batch block-sharded over the 'data' mesh axis,
                # each device contributes the same examples to every
                # microbatch slot, so the reshape needs no resharding
                # collective (a contiguous split would).
                micro = x.shape[0] // grad_accum
                return x.reshape(
                    (micro, grad_accum) + x.shape[1:]).swapaxes(0, 1)

            micro_batches = jax.tree.map(split, batch)
            xs = (micro_batches, jax.tree.map(split, statics)
                  if statics is not None else None)

            def body(carry, xs_i):
                g_acc, loss_acc, micro_i = carry
                b_i, s_i = xs_i
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                        state["params"], b_i, s_i, state["step"], micro_i)
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                return (g_acc, loss_acc + loss, micro_i + 1), aux

            zero_g = jax.tree.map(jnp.zeros_like, state["params"])
            carry0 = (zero_g, jnp.zeros(()), jnp.zeros((), jnp.int32))
            (g_sum, loss_sum, _), (vis_stacked, taps_stacked) = (
                jax.lax.scan(body, carry0, xs))
            grads = jax.tree.map(lambda g: g / grad_accum, g_sum)
            loss = loss_sum / grad_accum
            # (N, micro, ...) -> (bs, ...), inverting the strided
            # split: vis for the whole batch in original order.
            to_vis = jax.tree.map(
                lambda x: x.swapaxes(0, 1).reshape(
                    (x.shape[0] * x.shape[1],) + x.shape[2:]),
                vis_stacked)
            # BN batch stats averaged over the microbatches (equal
            # sizes, so the mean of means is the full-batch mean; the
            # mean of vars approximates within-micro variance — one
            # EMA merge per optimizer step, like the unsplit batch).
            bn_taps = jax.tree.map(
                lambda t: jnp.mean(t, axis=0), taps_stacked)
        else:
            (loss, (to_vis, bn_taps)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                    state["params"], batch, statics, state["step"],
                    jnp.zeros((), jnp.int32))
        updates, opt_state = tx.update(
            grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        # Keras-BN moving statistics (no-op without BN layers). Runs
        # before nan_guard so a guarded step reverts these too.
        params = elements.merge_bn_stats(params, bn_taps)
        if nan_guard:
            ok = jnp.isfinite(loss)
            for g in jax.tree.leaves(grads):
                ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(g)))
            params, opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old),
                (params, opt_state),
                (state["params"], state["opt_state"]))
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        if "ema_params" in state:
            d = jnp.asarray(ema_decay, jnp.float32)
            new_state["ema_params"] = jax.tree.map(
                lambda e, p: (d * e.astype(jnp.float32)
                              + (1 - d) * p.astype(jnp.float32)
                              ).astype(e.dtype),
                state["ema_params"], params)
        if with_vis:
            return new_state, loss, to_vis
        return new_state, loss

    # Sharding follows the data: the driver places the state (replicated)
    # and the batch (data/tile-sharded) with device_put, and GSPMD
    # propagates — so one compiled step serves full batches and
    # replicated odd-sized (e.g. last vali) batches alike.
    del mesh, tile_spatial
    if cached_statics:
        return jax.jit(train_step, donate_argnums=0)
    # Without the cache, keep the two-arg signature (one traced arity).
    return jax.jit(lambda state, batch: train_step(state, batch),
                   donate_argnums=0)


def make_static_extractor(model):
    """Jitted (params, batch) -> {'feats': {loss_i: gt features},
    'products': {...}}: computes every params-independent per-example
    intermediate once — the warp products (models/base.static_products,
    incl. the static ground truth gt_camspc) and the cacheable loss
    features of that ground truth. Loss params are frozen, so one
    extraction per example is valid for the whole run."""

    def extract(params, batch):
        products = model.static_products(batch)
        feats = {}
        if model.feat_loss_indices():
            gt = (products["gt_camspc"] if "gt_camspc" in products
                  else model.gt_camspc(batch))
            feats = model.extract_gt_feats(params, gt)
        return {"feats": feats, "products": products}

    return jax.jit(extract)


def make_eval_step(model, mesh=None, tile_spatial=False):
    """Returns eval_step(state, batch) -> (loss, to_vis); jitted, unlike
    the reference's deliberately-eager vali step (its retracing
    pathology, reference: trainvali.py:293-296, doesn't exist under
    jax.jit's shape-keyed cache)."""

    def eval_step(state, batch):
        # Evaluate the EMA weights when the run keeps them (ema_decay).
        pred, gt, kwargs, to_vis = model.apply(
            ema_params_of(state), batch, "vali")
        kwargs["keep_batch"] = True
        per_example = model.compute_loss(
            ema_params_of(state), pred, gt, **kwargs)
        return jnp.mean(per_example), to_vis

    del mesh, tile_spatial  # sharding follows the data (see above)
    return jax.jit(eval_step)
