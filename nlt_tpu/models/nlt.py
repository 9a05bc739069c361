"""The NLT model: dual-path (query + observation) U-Net over UV space,
residual over the diffuse base, differentiable UV->camera warp, loss in
camera space.

Functional JAX re-design of the reference model (reference:
nlt/models/nlt.py:38-342). Dataflow kept exactly:

- query input  x = concat(base, cvis, lvis)           (:95)
- obs input    y_obs = [nn_rgb - nn_base]             (:96, one neighbor)
- interleaved dual U-Net: at every contracting stage the obs path runs
  its stage, the per-observation features are mean-aggregated, the query
  stage output is concatenated with the aggregate, and the result is
  pushed on the skip stack; expanding stages pop and concat (:141-199);
- obs_override substitutes the aggregated obs features at inference
  (:172-173, driven by nlt_test's feature-averaging);
- prediction is a residual over the diffuse base when
  skip_connect_base (:99-102);
- warp scaled by (uvw, uvh), top-left corner blacked out, resample to
  camera space, resize to (imh, imw) (:104-120);
- train/vali returns gt_camspc = alpha_blend(rgb_camspc, fg_camspc)
  (:132-137).

TPU-first: `apply` is pure (params, batch) -> outputs with static shapes,
so the whole model jits into one XLA program; the resampler is this
module's only gather (ops/resample). The host-side vis path mirrors the
reference's artifacts (pngs, APNG pairs, metadata JSON with PSNRs, HTML
gallery, test-time video).
"""

import os
from glob import glob
from os.path import join, exists

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses as losses_mod
from ..metrics import PSNR
from ..networks import convnet
from ..ops import resample as resample_mod
from ..utils import img as imgutil
from ..utils import io as ioutil
from ..utils import logging as logutil
from ..vis import html as htmlutil
from ..vis import video as videoutil
from .base import Model as BaseModel

logger = logutil.Logger(loggee="models/nlt")

# Channel counts of the fixed inputs: query = base(3) + cvis(1) + lvis(1);
# obs = nn_rgb - nn_base (3).
QUERY_IN_CH = 5
OBS_IN_CH = 3


def normalize_batch(batch):
    """Device-side input normalization: uint8 image fields -> [0,1] f32,
    float16 warp -> f32. Lets the host pipeline ship quantized batches
    (datasets/nlt.py device_normalize) with the cast fused into the
    step's XLA program."""
    def _norm(x):
        if not hasattr(x, "dtype"):
            return x
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        if x.dtype == jnp.float16:
            return x.astype(jnp.float32)
        return x

    return {k: _norm(v) for k, v in batch.items()}


class Model(BaseModel):
    def __init__(self, config):
        self.imh = config.get_int("imh")
        self.imw = config.get_int("imw")
        super().__init__(config)
        depth0 = config.get_int("depth0")
        depth = config.get_int("depth")
        kernel = config.get_int("kernel")
        stride = config.get_int("stride")
        norm = config.get_or_none("norm")
        act = config.get("act")
        pool = config.get_or_none("pool")
        net_kwargs = {"norm_type": norm, "act_type": act, "pool_type": pool}
        self.net = {
            "query": convnet.Network(
                depth0, depth, kernel, stride, bn_prefix="query_",
                **net_kwargs),
            "obs": convnet.Network(
                depth0, depth, kernel, stride, bn_prefix="obs_",
                **net_kwargs),
        }
        # The obs path keeps only contracting stages
        # (reference: nlt/models/nlt.py:57-59).
        obs = self.net["obs"]
        keep = [i for i, c in enumerate(obs.is_contracting) if c]
        obs.stages = [obs.stages[i] for i in keep]
        obs.is_contracting = [True] * len(keep)

        self.uvh = config.get_int("uvh")
        self.uvw = config.get_int("uvw")
        self.use_obs = config.get_bool("use_obs")
        # obs_weighting = inverse_distance: multi-observation feature
        # aggregation weights each observation by 1/distance (batch
        # field nn_dist from datasets/nlt.py) instead of the flat mean
        # — the weighted branch of the reference's obs list its dataset
        # never fed (reference: nlt/models/nlt.py:161-164).
        self.obs_weighting = (
            config.get("obs_weighting", "none") or "none").lower()
        assert self.obs_weighting in ("none", "inverse_distance"), (
            "Unknown obs_weighting %r" % self.obs_weighting)
        # n_obs > 1: fold the K observations into the obs path's batch
        # axis (one batched conv per stage; _apply_unet docstring).
        # MEASURED AND DEFAULTED OFF: at n_obs=3 512^2 bf16 the folded
        # cached step ran 51.1 ms vs 46.7 unrolled on v5e (honest
        # slope timing, tools/bench_obs_fold.py) — the batched-conv
        # win loses to the fold's reshape/layout cost at flagship
        # shapes. The knob remains for re-measurement at other shapes.
        # Note: with norm=batch, folding also changes BN semantics
        # (batch statistics over the N*K axis couple observations).
        self.obs_fold = config.get_bool("obs_fold", False)
        if self.obs_fold and norm == "batch":
            logger.warn(
                "obs_fold=True with norm=batch: the obs path's BN "
                "batch statistics run over the folded (N*K) axis, "
                "coupling observations (not equal to the unrolled "
                "per-observation loop)")
        self.skip_connect_base = config.get_bool("skip_connect_base")
        self.resample_impl = config.get("resample_impl", "xla")
        # bfloat16 runs the U-Net in half precision (params stay f32;
        # per-layer casts in networks/elements.py): MXU throughput and
        # HBM bandwidth both double. Everything outside the net (warp,
        # resampling, losses) stays float32.
        self.compute_dtype = jnp.dtype(
            config.get("compute_dtype", "float32"))
        # remat=True rematerializes each U-Net stage's activations in
        # the backward pass (jax.checkpoint) instead of keeping them in
        # HBM — identical numerics, ~stage-depth× smaller activation
        # footprint, extra forward FLOPs. The standard TPU trade for
        # training past HBM at high uvh/depth/batch.
        self.remat = config.get_bool("remat", False)
        self.psnr = PSNR(np.float32)

    def _stage_apply(self, stage, p, x):
        if self.remat:
            return jax.checkpoint(stage.apply)(p, x)
        return stage.apply(p, x)

    def _init_loss(self):
        """Barron needs image dims, so override the base
        (reference: nlt/models/nlt.py:66-87)."""
        loss_str = self.config.get("loss")
        return losses_mod.build_losses(
            loss_str, config=self.config,
            imh=self.config.get_int("imh"), imw=self.config.get_int("imw"))

    # ---- parameters ----

    def init_params(self, key):
        """Channel bookkeeping must mirror apply()'s interleaved dataflow:
        contracting query stages consume [query_out + obs_out] channels
        when use_obs, expanding stages consume [prev_out + skip] channels.
        """
        k_query, k_obs = jax.random.split(key)
        query = self.net["query"]
        obs = self.net["obs"]

        query_params = [None] * len(query.stages)
        obs_params = [None] * len(obs.stages)

        obs_ch = OBS_IN_CH
        q_ch = QUERY_IN_CH
        skip_chs = []
        obs_i = 0
        for i, (stage, contracting) in enumerate(
                zip(query.stages, query.is_contracting)):
            if contracting:
                k_obs, sub = jax.random.split(k_obs)
                obs_params[obs_i], obs_out = obs.stages[obs_i].init(
                    sub, obs_ch)
                obs_ch = obs_out
                obs_i += 1

                k_query, sub = jax.random.split(k_query)
                query_params[i], q_out = stage.init(sub, q_ch)
                if self.use_obs:
                    q_ch = q_out + obs_out
                else:
                    q_ch = q_out
                skip_chs.append(q_ch)
            else:
                if skip_chs:
                    q_ch = q_ch + skip_chs.pop()
                k_query, sub = jax.random.split(k_query)
                query_params[i], q_out = stage.init(sub, q_ch)
                q_ch = q_out

        return {
            "net": {"query": query_params, "obs": obs_params},
            "loss": self.init_loss_params(),
        }

    # ---- forward ----

    def apply(self, params, batch, mode, obs_override=None, statics=None):
        """batch: dict with array fields base, cvis, lvis, warp, rgb,
        rgb_camspc, nn_base, nn_rgb, nn_rgb_camspc (NHWC float32); host
        metadata (id, nn_id) is carried outside the jitted path.

        statics: optional cached `static_products(batch)` output (the
        warp products gt_camspc/base_camspc, which depend only on static
        per-example data). When given, the fg and base resamples are
        skipped — only the prediction is warped — with identical outputs
        (parallel/feat_cache.py). Train/vali modes only."""
        self._validate_mode(mode)
        batch = normalize_batch(batch)
        base = batch["base"]
        cvis = batch["cvis"]
        lvis = batch["lvis"]
        warp = batch["warp"]
        rgb_camspc = batch["rgb_camspc"]

        x = jnp.concatenate((base, cvis, lvis), axis=3)
        nn_rgb, nn_base = batch["nn_rgb"], batch["nn_base"]
        nn_camspc = batch["nn_rgb_camspc"]
        obs_weights = None
        if (self.obs_weighting == "inverse_distance"
                and nn_rgb.ndim == 5 and "nn_dist" in batch):
            # 1/d weights; epsilon guards a (theoretical) zero distance.
            # Cast to the compute dtype: f32 weights would promote the
            # weighted obs_agg — and through the concat, the entire
            # downstream query U-Net — to f32 under bf16 compute.
            obs_weights = (1.0 / (batch["nn_dist"] + jnp.float32(1e-6))
                           ).astype(self.compute_dtype)
        if nn_rgb.ndim == 5:
            # Multi-observation batch (N, K, H, W, C): the K
            # observations run FOLDED into the obs path's batch axis
            # (one batched conv per stage; see _apply_unet), with
            # per-stage features mean-aggregated exactly like the
            # reference's obs list (reference: nlt/models/nlt.py:96,
            # 161-164). obs_fold=False restores the unrolled per-
            # observation loop for A/B. Vis shows the first (nearest)
            # observation.
            if self.obs_fold:
                y_obs = nn_rgb - nn_base
            else:
                y_obs = [nn_rgb[:, j] - nn_base[:, j]
                         for j in range(nn_rgb.shape[1])]
            nn_camspc = nn_camspc[:, 0]
        else:
            y_obs = [nn_rgb - nn_base]  # one neighbor

        if self.compute_dtype != jnp.float32:
            x = x.astype(self.compute_dtype)
            if isinstance(y_obs, list):
                y_obs = [t.astype(self.compute_dtype) for t in y_obs]
            else:
                y_obs = y_obs.astype(self.compute_dtype)
        pred = self._apply_unet(
            params["net"], x, y_obs, obs_weights=obs_weights,
            obs_override=obs_override)
        pred = pred.astype(jnp.float32)
        if self.skip_connect_base:
            pred = pred + base

        warp = self._scale_warp(warp)

        pred_c = imgutil.set_left_top_corner(pred, 0.0)
        plan = statics.get("pred_plan") if statics is not None else None
        if plan is not None:
            # The warp-only work (rows, bilinear weights, scatter
            # routing) was precomputed per example (static_products)
            # and cached in HBM; only the window take + weighted
            # combine (and its Pallas-scatter VJP) run per step.
            pred_camspc = resample_mod.resample_planned(
                pred_c, plan, out_hw=(warp.shape[1], warp.shape[2]),
                compact_route=self.config.get(
                    "take_compact_route", "take"))
        else:
            pred_camspc = resample_mod.resample(
                pred_c, warp, impl=self.resample_impl)
        pred_camspc = imgutil.resize(pred_camspc, self.imh, self.imw)

        if statics is not None:
            assert mode in ("train", "vali"), \
                "statics caching is a train/vali-path optimization"
            to_vis = {
                "base_camspc": statics["base_camspc"],
                "pred": pred,
                "pred_camspc": pred_camspc,
                "nn_camspc": nn_camspc,
                "gt": batch["rgb"],
                "gt_camspc": statics["gt_camspc"],
            }
            return pred_camspc, statics["gt_camspc"], {}, to_vis

        gt_camspc, base_camspc = self._warp_bases(batch, warp)
        to_vis = {
            "base_camspc": base_camspc,
            "pred": pred,
            "pred_camspc": pred_camspc,
            "nn_camspc": nn_camspc,
        }
        if mode in ("train", "vali"):
            to_vis["gt"] = batch["rgb"]
            to_vis["gt_camspc"] = gt_camspc
            return pred_camspc, gt_camspc, {}, to_vis
        return pred_camspc, None, None, to_vis

    def _scale_warp(self, warp):
        """Normalized [0,1] warp -> source-pixel units
        (reference: nlt/models/nlt.py:104-106)."""
        return jnp.stack(
            (warp[:, :, :, 0] * self.uvw, warp[:, :, :, 1] * self.uvh),
            axis=3)

    def _warp_bases(self, batch, warp):
        """The params-independent warp products: the warped diffuse base
        and the training target gt_camspc (camera photo alpha-blended
        with the warped foreground mask). ONE implementation shared by
        apply()'s uncached path and static_products' HBM-cached path, so
        the two can never diverge. In test mode the returned gt_camspc
        is meaningless (rgb_camspc is a zero placeholder) and unused —
        XLA prunes it.

        Three separate resamples, NOT one packed 9-channel call: the
        packed variant was measured 2.2x SLOWER in the full training
        program (264 vs 122 ms/step) — the wider rows push the
        gather/scatter into worse layouts on this backend."""
        base = batch["base"]
        n, h, w = base.shape[:3]
        fg = jnp.ones((n, h, w, 3), jnp.float32)
        fg = imgutil.set_left_top_corner(fg, 0.0)
        base_c = imgutil.set_left_top_corner(base, 0.0)
        fg_camspc = resample_mod.resample(
            fg, warp, impl=self.resample_impl)
        base_camspc = resample_mod.resample(
            base_c, warp, impl=self.resample_impl)
        fg_camspc = imgutil.resize(fg_camspc, self.imh, self.imw)
        base_camspc = imgutil.resize(base_camspc, self.imh, self.imw)
        gt_camspc = imgutil.alpha_blend(batch["rgb_camspc"], fg_camspc)
        return gt_camspc, base_camspc

    def static_products(self, batch):
        """Everything in apply() that depends only on static per-example
        data (never on params): the training target gt_camspc
        (rgb_camspc alpha-blended with the foreground mask warped
        through the fixed uv2cam field) and the warped diffuse base
        base_camspc. Computed once per example and cached in HBM by the
        driver (parallel/feat_cache.py), removing two of the three
        per-step resamples (reference recomputes all three every step:
        nlt/models/nlt.py:104-137)."""
        batch = normalize_batch(batch)
        warp = self._scale_warp(batch["warp"])
        h, w = batch["base"].shape[1:3]
        gt_camspc, base_camspc = self._warp_bases(batch, warp)
        products = {
            "gt_camspc": gt_camspc,
            "base_camspc": base_camspc,
        }
        if self.resample_impl == "xla":
            # Warp-only resample plan for the per-step pred warp (rows,
            # per-slot bilinear weights, backward-scatter routing) —
            # consumed by resample_planned in apply(). The (0, 0) texel
            # is blacked out before the resample and its gradient
            # zeroed by set_left_top_corner's VJP, so updates that only
            # write there (all background queries) are dropped from the
            # scatter plan.
            # take_compact_frac > 0 opts into forward-take compaction:
            # the plan keeps only live query rows, padded to
            # ceil(frac * Ho * Wo) per example (a loud error at cache
            # insert if a scene's coverage exceeds it —
            # parallel/feat_cache.insert).
            frac = self.config.get_float("take_compact_frac", 0.0)
            compact = (int(np.ceil(frac * warp.shape[1]
                                   * warp.shape[2]))
                       if frac > 0 else None)
            products["pred_plan"] = resample_mod.make_plan(
                warp, h, w, zero_grad_texel=(0, 0),
                compact_rows=compact)
        return products

    def gt_camspc(self, batch):
        """The training target, computed WITHOUT the network (see
        static_products)."""
        return self.static_products(batch)["gt_camspc"]

    def _apply_unet(self, net_params, query_x, obs_xs, obs_weights=None,
                    obs_override=None):
        """The interleaved dual U-Net (reference: nlt/models/nlt.py:141-199).

        obs_xs: a list of (N, H, W, C) observation inputs, or a single
        (N, K, H, W, C) array — the K observations then run FOLDED into
        the batch axis (one batched conv per obs stage instead of K
        small ones: bigger MXU matmuls, and the mesh's 'data' sharding
        parallelizes observations with no extra axis — the TPU-native
        form of SURVEY §7 M5's light/view-pair sharding). Identical
        math for per-example stages (convs; the per-stage mean runs
        over the unfolded K view); BatchNorm is the exception — its
        batch statistics would couple observations across the folded
        axis, so norm=batch defaults to the unrolled path (__init__).

        obs_override: optional list with one entry per contracting stage
        (an (N, H, W, C) aggregated feature map) substituting obs_agg.
        """
        query = self.net["query"]
        obs = self.net["obs"]
        q_params = net_params["query"]
        o_params = net_params["obs"]
        folded_k = None
        if not isinstance(obs_xs, (list, tuple)):
            n, folded_k = obs_xs.shape[0], obs_xs.shape[1]
            obs_x = obs_xs.reshape((n * folded_k,) + obs_xs.shape[2:])
        if obs_weights is not None:
            if folded_k is not None:
                # (N, K) -> broadcast over the unfolded feature view.
                obs_weights = obs_weights.reshape(
                    obs_weights.shape[0], obs_weights.shape[1], 1, 1, 1)
            else:
                obs_weights = obs_weights.reshape(
                    obs_weights.shape[0], 1, 1, 1, -1)

        query_featmaps = []
        obs_i = 0
        query_y = None
        for i, (stage, contracting) in enumerate(
                zip(query.stages, query.is_contracting)):
            if contracting:
                if folded_k is not None:
                    obs_x = self._stage_apply(
                        obs.stages[obs_i], o_params[obs_i], obs_x)
                    kview = obs_x.reshape(
                        (n, folded_k) + obs_x.shape[1:])
                    if obs_weights is None:
                        obs_agg = jnp.mean(kview, axis=1)
                    else:
                        obs_agg = (jnp.sum(obs_weights * kview, axis=1)
                                   / jnp.sum(obs_weights, axis=1))
                    obs_i += 1
                else:
                    obs_ys = [
                        self._stage_apply(
                            obs.stages[obs_i], o_params[obs_i], t)
                        for t in obs_xs]
                    # Mean-aggregate observation features
                    # (reference: nlt/models/nlt.py:161-164). A single
                    # unweighted observation aggregates to itself (mean
                    # over one element) — skip the stack/mean, whose
                    # materialized (N, H, W, C, 1) intermediate costs
                    # real copies.
                    if obs_weights is None and len(obs_ys) == 1:
                        obs_agg = obs_ys[0]
                    elif obs_weights is None:
                        obs_agg = jnp.mean(
                            jnp.stack(obs_ys, axis=-1), axis=-1)
                    else:
                        # Weighted mean: normalize by the weight sum,
                        # not K.
                        obs_agg = jnp.stack(obs_ys, axis=-1)
                        obs_agg = (
                            jnp.sum(obs_weights * obs_agg, axis=-1)
                            / jnp.sum(obs_weights, axis=-1))
                    obs_xs = obs_ys
                    obs_i += 1

                query_y = self._stage_apply(stage, q_params[i], query_x)
                if self.use_obs:
                    if obs_override is not None:
                        obs_agg = obs_override[i]
                    query_x = jnp.concatenate((query_y, obs_agg), axis=-1)
                else:
                    query_x = query_y
                query_featmaps.append(query_x)
            else:
                if query_featmaps:
                    enc = query_featmaps.pop()
                    query_x = jnp.concatenate((query_x, enc), axis=-1)
                query_y = self._stage_apply(stage, q_params[i], query_x)
                query_x = query_y
        return query_y

    def extract_obs_features(self, net_params, x):
        """Run x through the obs path, returning every stage's feature map
        (the pyramid nlt_test averages; reference: nlt_test.py:97-127)."""
        obs = self.net["obs"]
        feats = []
        for i in range(len(obs.stages)):
            x = obs.stages[i].apply(net_params["obs"][i], x)
            feats.append(x)
        return feats

    # ---- visualization (host-side) ----

    def vis_batch(self, data_dict, outdir, mode, dump_raw_to=None,
                  text_loc_ratio=0.05, text_size_ratio=0.05,
                  text_color=(1, 1, 1)):
        """Write per-sample pngs, APNG comparisons, and metadata JSON with
        PSNRs (reference: nlt/models/nlt.py:207-272)."""
        is_linear = self.config.get_bool("linear_space")
        self._validate_mode(mode)
        os.makedirs(outdir, exist_ok=True)
        ids = [str(x) for x in data_dict["id"]]
        nn_ids = [str(x) for x in data_dict["nn_id"]]
        # Accept device-packed vis arrays (uint8/f16; trainvali.pack_vis).
        bases = imgutil.vis_to_float01(data_dict["base_camspc"])
        preds = imgutil.vis_to_float01(data_dict["pred_camspc"])
        nns = imgutil.vis_to_float01(data_dict["nn_camspc"])
        gts = (None if mode == "test"
               else imgutil.vis_to_float01(data_dict["gt_camspc"]))

        for i in range(len(ids)):
            imgs = {}
            base = np.clip(bases[i], 0, 1)
            pred = np.clip(preds[i], 0, 1)
            nn = np.clip(nns[i], 0, 1)
            gt = None if gts is None else np.clip(gts[i], 0, 1)
            if is_linear:
                base = imgutil.linear2srgb(base)
                pred = imgutil.linear2srgb(pred)
                nn = imgutil.linear2srgb(nn)
                gt = None if gt is None else imgutil.linear2srgb(gt)
            imgs["base"] = ioutil.write_img(
                base, join(outdir, "%d_base.png" % i))
            imgs["pred"] = ioutil.write_img(
                pred, join(outdir, "%d_pred.png" % i))
            ioutil.write_img(nn, join(outdir, "%d_nn.png" % i))
            imgs["gt"] = None if gt is None else ioutil.write_img(
                gt, join(outdir, "%d_gt.png" % i))

            hw = base.shape[:2]
            label_loc = (int(text_loc_ratio * hw[1]),
                         int(text_loc_ratio * hw[0]))
            font_size = int(text_size_ratio * hw[0])
            videoutil.make_apng(
                (imgs["base"], imgs["pred"]),
                labels=("Diffuse Base", "Prediction"),
                label_top_left_xy=label_loc, font_size=font_size,
                font_color=text_color,
                outpath=join(outdir, "%d_base-vs-pred.apng" % i))
            if imgs["gt"] is not None:
                videoutil.make_apng(
                    (imgs["gt"], imgs["pred"]),
                    labels=("Ground Truth", "Prediction"),
                    label_top_left_xy=label_loc, font_size=font_size,
                    font_color=text_color,
                    outpath=join(outdir, "%d_gt-vs-pred.apng" % i))

        for i, id_ in enumerate(ids):
            metadata = {"id": id_, "nn_id": nn_ids[i]}
            if gts is not None:
                pred = np.clip(preds[i], 0, 1)
                base = np.clip(bases[i], 0, 1)
                gt = np.clip(gts[i], 0, 1)
                # PSNR is inf on an exact match; null keeps the JSON
                # strictly parseable.
                for key, v in (("pred_psnr", self.psnr(gt, pred)),
                               ("base_psnr", self.psnr(gt, base))):
                    metadata[key] = float(v) if np.isfinite(v) else None
            ioutil.write_json(metadata, join(outdir, "%d_metadata.json" % i))

        if dump_raw_to is not None:
            raw = {k: np.asarray(v) if not isinstance(v, list) else v
                   for k, v in data_dict.items()}
            ioutil.write_pickle(raw, dump_raw_to)

    def compile_batch_vis(self, batch_vis_dirs, outpref, mode, fps=6):
        """HTML gallery for train/vali, mp4/apng video for test
        (reference: nlt/models/nlt.py:274-342)."""
        self._validate_mode(mode)
        if mode in ("train", "vali"):
            outpath = outpref + ".html"
            self._compile_into_webpage(
                batch_vis_dirs, outpath, title="NLT (%s)" % mode)
        else:
            outpath = outpref + ".mp4"
            outpath = self._compile_into_video(
                batch_vis_dirs, outpath, fps=fps)
        return outpath

    @staticmethod
    def _compile_into_webpage(batch_dirs, out_html, title=None):
        rows, caps, types = [], [], []
        for batch_dir in batch_dirs:
            for metadata_path in sorted(
                    glob(join(batch_dir, "[0-9]*_metadata.json"))):
                prefix = metadata_path[:-len("metadata.json")]
                metadata = str(ioutil.read_json(metadata_path))
                rows.append([
                    metadata,
                    prefix + "base-vs-pred.apng",
                    prefix + "gt-vs-pred.apng",
                    prefix + "nn.png"])
                caps.append([
                    "Metadata", "Prediction vs. Diffuse Base",
                    "Prediction vs. Ground Truth", "Nearest Neighbor"])
                types.append(["text", "image", "image", "image"])
        assert rows, "No row"
        page = htmlutil.HTML(title=title)
        table = page.add_table()
        for r, rc, rt in zip(rows, caps, types):
            table.add_row(r, rt, captions=rc)
        page.save(out_html)

    @staticmethod
    def _compile_into_video(batch_dirs, out_mp4, fps=12):
        frames = {}
        for batch_dir in batch_dirs:
            for metadata_path in glob(join(batch_dir, "[0-9]*_metadata.json")):
                prefix = metadata_path[:-len("metadata.json")]
                pred_path = prefix + "pred.png"
                if not exists(pred_path):
                    logger.warn(
                        "Skipping because of missing file:\n\t%s", pred_path)
                    continue
                metadata = ioutil.read_json(metadata_path)
                frames[metadata["id"]] = ioutil.load_img(pred_path)
        frames_sorted = [frames[k] for k in sorted(frames)]
        return ioutil.write_video(frames_sorted, out_mp4, fps=fps)
