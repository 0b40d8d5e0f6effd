"""Trainer: pjit-compiled train step over a TPU mesh
(reference: core/training/trainer.py:30-626).

TPU-first redesign of the reference's training loop:

* The whole step — iterative click simulation (reference: trainer.py:399-442),
  prev-mask dropout, forward, NFL loss, backward, optimizer — is ONE compiled
  XLA program. The reference runs the frozen backbone 1+num_iters times per
  step with a CPU OpenCV EDT round-trip per iteration (trainer.py:585-618);
  here the corrective clicks are selected by the exact on-device EDT
  (ops.edt.edt_l2sq_device) and a categorical draw over the inner region, so
  the device never waits on the host.
* Data parallelism: the batch is sharded over the mesh's `data` axis and
  params are replicated; XLA inserts the gradient all-reduce over ICI (the
  NCCL/DDP replacement, SURVEY.md §2.12).
* Frozen modules (backbone, upsampler) are split out of the differentiated
  parameter tree via stop_gradient, so no backward FLOPs are spent on their
  weight gradients.
"""

from __future__ import annotations

import logging
import random as pyrandom
import time
from copy import deepcopy
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from isegprobe_tpu.data.loader import DataLoader
from isegprobe_tpu.ops.edt import edt_l2sq_device
from isegprobe_tpu.parallel.mesh import (
    make_mesh,
    process_is_master,
    put_global_batch,
    reduce_loss_dict,
    replicate,
)
from isegprobe_tpu.training.optim import make_optimizer, multistep_lr
from isegprobe_tpu.utils.misc import stamped
from isegprobe_tpu.utils.viz import draw_points, draw_probmap
from isegprobe_tpu.utils.serialization import (
    load_checkpoint,
    merge_params,
    model_config,
    save_checkpoint,
)

logger = logging.getLogger("isegprobe_tpu")

FROZEN_PREFIXES = ("backbone", "upsampler")


def split_params(params: Dict, frozen_prefixes=FROZEN_PREFIXES):
    trainable = {k: v for k, v in params.items() if k not in frozen_prefixes}
    frozen = {k: v for k, v in params.items() if k in frozen_prefixes}
    return trainable, frozen


def _count_vit_blocks(backbone_params) -> int:
    """Number of `blocks_N` transformer layers in a backbone param tree
    (0 if the backbone is absent/frozen) — feeds layer-wise LR decay."""
    if not backbone_params:
        return 0
    import re

    depth = 0
    for path, _ in jax.tree_util.tree_flatten_with_path(backbone_params)[0]:
        for p in path:
            key = getattr(p, "key", p)
            m = re.match(r"blocks_(\d+)$", str(key))
            if m:
                depth = max(depth, int(m.group(1)) + 1)
    return depth


def get_next_points_device(
    prob: jnp.ndarray,
    gt: jnp.ndarray,
    points: jnp.ndarray,
    click_indx: jnp.ndarray,
    rng: jax.Array,
    pred_thresh: float = 0.49,
) -> jnp.ndarray:
    """On-device corrective-click selection (reference: trainer.py:577-618):
    EDT of the FN/FP error regions, then a uniform draw from the region deeper
    than half the max distance. Clicks are written *backwards* into the fixed
    points tensor at num_points - click_indx, like the reference."""
    b = prob.shape[0]
    num_points = points.shape[1] // 2
    pred = prob[..., 0]
    gtm = gt[..., 0] > 0.5

    fn = gtm & (pred < pred_thresh)
    fp = (~gtm) & (pred > pred_thresh)
    d2 = edt_l2sq_device(jnp.stack([fn, fp], axis=1), pad_border=True)  # [B,2,H,W]
    fn_d2, fp_d2 = d2[:, 0], d2[:, 1]

    fn_max = jnp.max(fn_d2, axis=(1, 2))
    fp_max = jnp.max(fp_d2, axis=(1, 2))
    is_positive = fn_max > fp_max
    dt = jnp.where(is_positive[:, None, None], fn_d2, fp_d2)
    max_d2 = jnp.maximum(fn_max, fp_max)

    # squared form of dt_sqrt > max_dist/2
    inner = dt > (max_d2 / 4.0)[:, None, None]
    has_any = max_d2 > 0

    h, w = pred.shape[1], pred.shape[2]
    logits = jnp.where(inner.reshape(b, -1), 0.0, -1e30)
    idx = jax.random.categorical(rng, logits, axis=-1)
    y = (idx // w).astype(points.dtype)
    x = (idx % w).astype(points.dtype)

    row = jnp.where(is_positive, num_points - click_indx,
                    2 * num_points - click_indx)
    new_row = jnp.stack([y, x, jnp.full((b,), click_indx, dtype=points.dtype)],
                        axis=-1)

    def write(pts_b, row_b, val_b, ok_b):
        return jax.lax.cond(
            ok_b, lambda p: p.at[row_b].set(val_b), lambda p: p, pts_b
        )

    return jax.vmap(write)(points, row, new_row, has_any)


class iSegTrainer:
    """Epoch loop with on-device iterative click simulation.

    Mirrors the reference constructor surface (trainer.py:30-53).
    ``click_models`` — a list of params state-dicts — makes simulation
    iteration k run the k-th eval model (reference: trainer.py:410-415);
    ``net_inputs`` is accepted for config parity.
    """

    def __init__(
        self,
        model,
        cfg,
        loss_cfg: Dict,
        trainset,
        valset,
        optimizer: str = "adam",
        optimizer_params: Optional[Dict] = None,
        layerwise_decay: bool = False,
        image_dump_interval: int = 200,
        checkpoint_interval: Any = 10,
        tb_dump_period: int = 25,
        max_interactive_points: int = 0,
        lr_scheduler: Optional[Dict] = None,  # {'milestones': [...], 'gamma': g}
        metrics: Optional[List] = None,
        additional_val_metrics: Optional[List] = None,
        net_inputs: Tuple[str, str] = ("images", "points"),
        max_num_next_clicks: int = 0,
        click_models=None,
        prev_mask_drop_prob: float = 0.0,
        seed: int = -1,
        mesh=None,
        dtype=jnp.float32,
        debug_nans: bool = False,
    ) -> None:
        if debug_nans:
            # SURVEY.md §5: the TPU-native stand-in for the reference's
            # determinism/sanitizer machinery — fail fast on NaN/Inf
            jax.config.update("jax_debug_nans", True)
        self.model = model
        self.cfg = cfg
        self.loss_cfg = loss_cfg
        self.max_interactive_points = max_interactive_points
        self.max_num_next_clicks = max_num_next_clicks
        self.prev_mask_drop_prob = prev_mask_drop_prob
        self.checkpoint_interval = checkpoint_interval
        self.image_dump_interval = image_dump_interval
        self.tb_dump_period = tb_dump_period
        self.seed = seed if seed != -1 else 0
        self.task_prefix = ""
        self.sw = None

        self.trainset = trainset
        self.valset = valset
        self.mesh = mesh if mesh is not None else make_mesh()

        batch_size = cfg.dataloader.batch_size
        val_batch_size = getattr(cfg.dataloader, "val_batch_size", batch_size)
        workers = getattr(cfg.dataloader, "workers", 4)
        # dataloader.mp=true -> process workers (GIL-free item builds; see
        # data/loader.py — the reference's num_workers>0 fork semantics)
        use_mp = bool(getattr(cfg.dataloader, "mp", False))
        self.train_data = DataLoader(trainset, batch_size, shuffle=True,
                                     num_workers=workers, seed=self.seed,
                                     use_processes=use_mp, salt="train")
        self.val_data = DataLoader(valset, val_batch_size, shuffle=False,
                                   num_workers=workers, seed=self.seed,
                                   use_processes=use_mp, salt="val")

        self.train_metrics = metrics or []
        self.val_metrics = deepcopy(self.train_metrics)
        if additional_val_metrics:
            self.val_metrics.extend(additional_val_metrics)

        optimizer_params = dict(optimizer_params or {"lr": 5e-5})
        self.base_lr = optimizer_params.pop("lr")
        steps_per_epoch = max(1, len(self.train_data))
        if lr_scheduler is not None:
            self.lr_schedule = multistep_lr(
                self.base_lr, lr_scheduler["milestones"],
                lr_scheduler.get("gamma", 0.1), steps_per_epoch,
            )
        else:
            self.lr_schedule = self.base_lr
        self.layerwise_decay = layerwise_decay
        self._opt_kwargs = {k: v for k, v in optimizer_params.items()
                            if k in ("betas", "eps", "momentum", "weight_decay")}
        self._opt_name = optimizer

        # -- init params ------------------------------------------------
        init_rng = jax.random.PRNGKey(self.seed)
        sample = trainset[0]
        img = jnp.zeros((1, *sample["images"].shape), dtype)
        if getattr(model, "with_prev_mask", False):
            img = jnp.concatenate(
                [img, jnp.zeros((1, *sample["images"].shape[:2], 1), dtype)], -1
            )
        pts = jnp.full((1, *sample["points"].shape), -1.0, dtype)
        params = model.init(init_rng, img, pts)["params"]

        params = self._load_pretrained(params)
        if getattr(cfg.training, "weights", None):
            loaded, _, _ = load_checkpoint(cfg.training.weights)
            params = merge_params(params, loaded)

        # click-wise eval ensembles for the training simulation (reference:
        # trainer.py:173-175, 410-415): iteration k of the no-grad click loop
        # runs click_models[k] (params state-dicts merged over the init)
        self._click_trees = tuple(
            replicate(merge_params(dict(params), cm), self.mesh)
            for cm in (click_models or ())
        )

        trainable, frozen = split_params(params)
        # the optimizer is built AFTER params exist so layer-wise LR decay
        # (reference: optimizer.py:38-56, lr_decay.py:15-87) can key its scale
        # tree on the actual parameter paths. With the default frozen
        # backbone the trainable tree has no 'backbone' top and the decay is
        # an honest no-op (warned), matching the probing setup.
        if layerwise_decay:
            from isegprobe_tpu.training.optim import (
                make_layerwise_decay_optimizer,
            )

            depth = _count_vit_blocks(trainable.get("backbone"))
            if depth == 0:
                logger.warning(
                    "layerwise_decay=True but the backbone is frozen (not in "
                    "the trainable tree) — layer-wise LR decay is a no-op")
            self.tx = make_layerwise_decay_optimizer(
                self._opt_name, self.lr_schedule, trainable,
                num_layers=max(depth, 1),
                trainable_prefixes=tuple(trainable.keys()),
                **self._opt_kwargs,
            )
        else:
            self.tx = make_optimizer(
                self._opt_name, self.lr_schedule,
                trainable_prefixes=("embed_coords", "head", "neck"),
                **self._opt_kwargs,
            )
        if self.mesh.shape.get("model", 1) > 1:
            # 2D (data, model) mesh: ViT-block kernels shard over the model
            # axis under the Megatron column/row rules (parallel/tp.py);
            # everything else — and therefore the probing setup's trainable
            # head/click-encoder — stays replicated. The compiled step runs
            # unchanged: GSPMD propagates the shardings through forward,
            # backward, and the optimizer update, inserting the per-block
            # psum pairs (gradient correctness vs the DP-only step is pinned
            # in tests/test_tensor_parallel.py).
            from isegprobe_tpu.parallel.tp import vit_param_shardings

            tree = {"trainable": trainable, "frozen": frozen}
            self.params = jax.tree.map(
                jax.device_put, tree, vit_param_shardings(tree, self.mesh))
        else:
            self.params = replicate(
                {"trainable": trainable, "frozen": frozen}, self.mesh)
        self.opt_state = replicate(self.tx.init(trainable), self.mesh)
        self.rng = jax.random.PRNGKey(self.seed + 1)

        # salt: training constants baked into the traced step (loss weights,
        # optimizer/schedule, click-sim depth, model config) — same shapes,
        # different program; see utils/misc.py: stamped
        step_salt = (repr(self.model), repr(loss_cfg), optimizer,
                     repr(optimizer_params), layerwise_decay,
                     repr(lr_scheduler), max_interactive_points,
                     max_num_next_clicks, prev_mask_drop_prob, str(dtype),
                     # lr was popped from optimizer_params above, and the
                     # schedule's step boundaries bake in steps_per_epoch —
                     # both are traced constants of the compiled step
                     self.base_lr, steps_per_epoch,
                     # the mesh layout changes shardings but not shapes or
                     # the program name — without this term, runs differing
                     # only in training.n_devices alias in the name+shape
                     # keyed remote executable cache (docs/PERF.md)
                     repr((self.mesh.axis_names, self.mesh.devices.shape)))
        # train/val are distinct traced programs with identical input shapes
        # (val_batch_size defaults to batch_size) — salt the distinction or
        # the name+shape-keyed remote executable cache could serve the TRAIN
        # binary (optimizer update + donated buffers) to the val caller
        self._train_step = jax.jit(
            stamped(partial(self._step, training=True), step_salt + ("train",)),
            donate_argnums=(0, 1),
        )
        self._val_step = jax.jit(
            stamped(partial(self._step, training=False), step_salt + ("val",)))

        self.is_master = process_is_master()
        self.epoch_losses: List[float] = []

    def _load_pretrained(self, params):
        """Overlay converted (msgpack) pretrained backbone weights declared in
        main_cfg's PRETRAINED_MODELS onto the fresh init (the reference
        downloads from torch.hub at build time instead; see
        scripts/convert_weights.py)."""
        pretrained = getattr(self.cfg, "PRETRAINED_MODELS", None) or {}
        btype = self.model.backbone_cfg["type"].lower()
        key = {"dinov2": "DINOV2_VITS14", "vit": "DINO_VITS16",
               "mask_clip": "MASKCLIP_VITB16"}.get(btype)
        path = pretrained.get(key) if key else None
        if path:
            from pathlib import Path

            from flax import serialization as flax_serialization

            if Path(path).exists():
                loaded = flax_serialization.msgpack_restore(
                    Path(path).read_bytes()
                )
                params = dict(params)
                params["backbone"] = merge_params(
                    params["backbone"], {"model": loaded}
                )
                logger.info("Loaded pretrained backbone from %s", path)
            else:
                logger.warning(
                    "PRETRAINED_MODELS.%s=%s not found; backbone stays "
                    "random-initialized", key, path,
                )
        # frozen-upsampler weights from upsampler_path (the reference loads
        # them at model build: core/utils/model_builder.py:59-76 with the
        # LoftUp key surgery / LiFT module. strip; see models/convert.py)
        from isegprobe_tpu.models.convert import load_upsampler_params

        up_loaded = load_upsampler_params(
            getattr(self.model, "upsampler_cfg", None))
        if up_loaded is not None:
            params = dict(params)
            params["upsampler"] = merge_params(params["upsampler"], up_loaded)
            logger.info("Loaded frozen upsampler weights from upsampler_path")
        return params

    # ------------------------------------------------------------------
    # the compiled step
    # ------------------------------------------------------------------

    def _forward(self, params_full, images, prev, points):
        net_input = images
        if getattr(self.model, "with_prev_mask", False):
            net_input = jnp.concatenate([images, prev], axis=-1)
        return self.model.apply({"params": params_full}, net_input, points)

    def _loss(self, outputs, batch):
        total = 0.0
        logging_out = {}
        # mixed-precision (bf16 model dtype): losses always reduce in f32
        for key in ("instances", "instances_aux"):
            if outputs.get(key) is not None and \
                    outputs[key].dtype != jnp.float32:
                outputs = dict(outputs, **{key: outputs[key].astype(
                    jnp.float32)})
        loss_fn = self.loss_cfg["instance_loss"]
        weight = self.loss_cfg.get("instance_loss_weight", 1.0)
        loss, aux = loss_fn(outputs["instances"], batch["instances"])
        loss = jnp.mean(loss)
        total = total + weight * loss
        logging_out["instance_loss"] = loss
        logging_out.update(aux)

        aux_loss_fn = self.loss_cfg.get("instance_aux_loss")
        if aux_loss_fn is not None and outputs.get("instances_aux") is not None:
            w = self.loss_cfg.get("instance_aux_loss_weight", 1.0)
            aux_loss, _ = aux_loss_fn(outputs["instances_aux"], batch["instances"])
            aux_loss = jnp.mean(aux_loss)
            total = total + w * aux_loss
            logging_out["instance_aux_loss"] = aux_loss
        return total, logging_out

    def _simulate_clicks(self, params_full, batch, rng, num_iters,
                         click_trees=()):
        """Iterative click refinement (reference: trainer.py:399-442), as a
        bounded fori_loop with masking — no data-dependent Python control.
        With ``click_trees`` the loop unrolls statically so iteration k can
        run a different (per-click-count) eval model."""
        images, points = batch["images"], batch["points"]
        gt = batch["instances"]
        b = images.shape[0]
        prev = jnp.zeros((*images.shape[:3], 1), images.dtype)

        if self.max_num_next_clicks == 0:
            return prev, points, rng

        def body(i, carry, eval_params=None):
            prev, points, rng = carry

            def do(args):
                prev, points, rng = args
                rng, k = jax.random.split(rng)
                out = self._forward(eval_params if eval_params is not None
                                    else params_full, images, prev, points)
                # f32 sigmoid even under bf16 model dtype: the EDT click
                # picker thresholds prob at 0.5 and compares error depths
                prob = jax.nn.sigmoid(out["instances"].astype(jnp.float32))
                points = get_next_points_device(prob, gt, points, i + 1, k)
                return prob, points, rng

            return jax.lax.cond(i < num_iters, do, lambda a: a,
                                (prev, points, rng))

        if click_trees:
            carry = (prev, points, rng)
            for i in range(self.max_num_next_clicks):
                tree = (click_trees[i] if i < len(click_trees)
                        else params_full)
                carry = body(i, carry, eval_params=tree)
            prev, points, rng = carry
        else:
            prev, points, rng = jax.lax.fori_loop(
                0, self.max_num_next_clicks,
                lambda i, c: body(i, c), (prev, points, rng)
            )

        if self.prev_mask_drop_prob > 0:
            rng, k = jax.random.split(rng)
            drop = jax.random.bernoulli(k, self.prev_mask_drop_prob, (b, 1, 1, 1))
            # the reference only drops when at least one click iter ran
            drop = drop & (num_iters > 0)
            prev = jnp.where(drop, jnp.zeros_like(prev), prev)
        return prev, points, rng

    def _step(self, params, opt_state, batch, rng, num_iters, iou_thresh=0.4,
              iou_step=0.025, click_trees=(), training=True):
        # batches arrive compact (uint8 images, int8 masks — the loader keeps
        # them small because the host->device upload dominates step wall time
        # on tunnel-attached chips: 9.6 MB f32 images cost ~540 ms vs 97 ms
        # as uint8); normalize/cast on device
        if jnp.issubdtype(batch["images"].dtype, jnp.integer):
            batch = dict(batch,
                         images=batch["images"].astype(jnp.float32) / 255.0)
        if jnp.issubdtype(batch["instances"].dtype, jnp.integer):
            batch = dict(batch,
                         instances=batch["instances"].astype(jnp.float32))
        frozen = jax.lax.stop_gradient(params["frozen"])

        full0 = {**params["trainable"], **frozen}
        prev, points, rng = self._simulate_clicks(
            jax.lax.stop_gradient(full0), batch, rng, num_iters, click_trees
        )
        batch = dict(batch, points=points)

        def loss_fn(trainable):
            outputs = self._forward({**trainable, **frozen},
                                    batch["images"], prev, batch["points"])
            total, logging_out = self._loss(outputs, batch)
            return total, (outputs, logging_out)

        if training:
            (loss, (outputs, logging_out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params["trainable"])
            updates, opt_state = self.tx.update(grads, opt_state,
                                                params["trainable"])
            trainable = optax.apply_updates(params["trainable"], updates)
            new_params = {"trainable": trainable, "frozen": params["frozen"]}
        else:
            loss, (outputs, logging_out) = loss_fn(params["trainable"])
            new_params, opt_state = params, opt_state

        logging_out["overall"] = loss
        # metric stats computed on device: 4 scalars instead of a full logits
        # transfer every step (reference pulls logits to CPU, metrics.py:55-78)
        from isegprobe_tpu.training.metrics import device_iou_stats

        iou_stats, iou_valid = device_iou_stats(
            outputs["instances"], batch["instances"], iou_thresh, iou_step
        )
        # sample-0 vis payload for TB image dumps (ref trainer.py:499-548):
        # tiny [H,W]+[2N,3] arrays that stay on device unless a dump step
        # actually fetches them
        vis = (jax.nn.sigmoid(outputs["instances"][0, ..., 0]),
               batch["points"][0])
        return (new_params, opt_state, loss, logging_out,
                (iou_stats, iou_valid), vis)

    # ------------------------------------------------------------------
    # epoch loops
    # ------------------------------------------------------------------

    def run(self, num_epochs: int, start_epoch: Optional[int] = None,
            validation: bool = True) -> None:
        if start_epoch is None:
            start_epoch = getattr(self.cfg.training, "start_epoch", 0)
        logger.info("Starting Epoch: %d / Total Epochs: %d", start_epoch, num_epochs)
        for epoch in range(start_epoch, num_epochs):
            self.training(epoch)
            if validation:
                self.validation(epoch)

    def _prep_batch(self, batch_data):
        # single- vs multi-process placement: parallel/mesh.put_global_batch
        return put_global_batch(batch_data, self.mesh)

    def training(self, epoch: int) -> None:
        self._ensure_writer()
        for metric in self.train_metrics:
            metric.reset_epoch_stats()

        # explicit epoch pinning so every rank permutes identically and a
        # resumed run re-seeds its data order (ref: trainer.py:201-202)
        self.train_data.set_epoch(epoch)
        pyrandom.seed(self.seed + epoch)
        train_loss = 0.0
        t0 = time.time()
        # depth-1 software pipeline: dispatch step i, then drain step i-1's
        # scalars — jax dispatch is async, so the host<->device round trip of
        # the previous step's logging fetch overlaps the current step's
        # compute (and the next batch's upload). Scalar-by-scalar float()
        # reads cost one full round trip EACH; bundling + deferring took a
        # tunnel-attached chip from 0.8 s/step to ~0.1 s (compute: 40 ms).
        # The AdaptiveIoU binarization threshold consequently lags one step —
        # an EMA with decay 0.99 (metrics.py), indistinguishable in practice.
        # depth-1 DEVICE prefetch on top: upload batch i+1 while step i's
        # compute is in flight (device_put is async), so the host->device
        # transfer — the dominant wall cost on a tunnel-attached chip —
        # overlaps the previous step instead of serializing before each
        # dispatch. Host-side item assembly is already overlapped by the
        # DataLoader's worker pool.
        pending = None
        data_it = iter(self.train_data)
        ahead = next(data_it, None)
        ahead = (ahead, self._prep_batch(ahead)) if ahead is not None else None
        i = -1
        while ahead is not None:
            i += 1
            batch_data, batch = ahead
            global_step = epoch * len(self.train_data) + i
            num_iters = pyrandom.randint(0, self.max_num_next_clicks)
            self.rng, step_rng = jax.random.split(self.rng)

            # the device triplet must be measured at the metric's own
            # (t-step, t, t+step) offsets or _absorb adapts on wrong evidence
            thr = (self.train_metrics[0].iou_thresh
                   if self.train_metrics else 0.4)
            step = (getattr(self.train_metrics[0], "thresh_step", 0.025)
                    if self.train_metrics else 0.025)
            (self.params, self.opt_state, loss, logging_out, iou_stats,
             vis_payload) = (
                self._train_step(self.params, self.opt_state, batch, step_rng,
                                 num_iters, thr, step,
                                 click_trees=self._click_trees)
            )

            # dispatch done (async) — start the NEXT batch's upload now so it
            # rides along with this step's device compute
            nxt = next(data_it, None)
            ahead = ((nxt, self._prep_batch(nxt))
                     if nxt is not None else None)

            if pending is not None:
                train_loss += self._finish_train_step(*pending)
            pending = (global_step, batch_data,
                       (loss, logging_out, iou_stats), vis_payload)
        if pending is not None:
            train_loss += self._finish_train_step(*pending)

        elapsed = time.time() - t0
        n = max(1, len(self.train_data))
        logger.info("Epoch %d: train loss %.4f (%.1fs, %.2f s/step)",
                    epoch, train_loss / n, elapsed, elapsed / n)
        if self.sw is not None:
            for m in self.train_metrics:
                self.sw.add_scalar(f"Metrics/{m.name}", m.get_epoch_value(), epoch)

        if self.is_master:
            self.save_checkpoint(epoch)

    def _finish_train_step(self, global_step, batch_data, handles,
                           vis_payload) -> float:
        """Drain one in-flight step: ONE bundled device transfer, then
        logging, metric update, and the periodic image dump."""
        loss_val, logging_host, iou_host = jax.device_get(handles)
        # cross-process mean for logging (ref: distributed.py:31-53); identity
        # in a single-process world. Every rank must join the collective —
        # gating it on self.sw (master-only) would deadlock the master's
        # process_allgather at the first logged step of a multi-process run.
        logged = reduce_loss_dict(
            {k: float(v) for k, v in logging_host.items()}
        )
        if self.sw is not None:
            for k, v in logged.items():
                self.sw.add_scalar(f"Losses/{k}", float(v), global_step)
            self.sw.add_scalar(
                "States/learning_rate",
                float(self.lr_schedule(global_step))
                if callable(self.lr_schedule) else self.lr_schedule,
                global_step,
            )
            for m in self.train_metrics:
                m.log_states(self.sw, f"Metrics/{m.name}", global_step)
        if (self.is_master and self.image_dump_interval > 0
                and global_step % self.image_dump_interval == 0):
            self.save_visualization(batch_data, vis_payload, global_step,
                                    prefix="train")
        for m in self.train_metrics:
            m.update_from_stats(np.asarray(iou_host[0]), bool(iou_host[1]))
        return float(loss_val)

    def validation(self, epoch: int) -> None:
        for metric in self.val_metrics:
            metric.reset_epoch_stats()
        val_loss = 0.0
        count = 0
        for batch_data in self.val_data:
            self.rng, step_rng = jax.random.split(self.rng)
            batch = self._prep_batch(batch_data)
            num_iters = pyrandom.randint(0, self.max_num_next_clicks)
            thr = self.val_metrics[0].iou_thresh if self.val_metrics else 0.4
            step = (getattr(self.val_metrics[0], "thresh_step", 0.025)
                    if self.val_metrics else 0.025)
            _, _, loss, _, iou_stats, _ = self._val_step(
                self.params, self.opt_state, batch, step_rng, num_iters, thr,
                step, click_trees=self._click_trees,
            )
            loss_val, iou_host = jax.device_get((loss, iou_stats))
            val_loss += float(loss_val)
            count += 1
            for m in self.val_metrics:
                m.update_from_stats(np.asarray(iou_host[0]), bool(iou_host[1]))
        if count:
            logger.info("Epoch %d: val loss %.4f", epoch, val_loss / count)
            if self.sw is not None:
                self.sw.add_scalar("Val/loss", val_loss / count, epoch)
                for m in self.val_metrics:
                    self.sw.add_scalar(f"Val/{m.name}", m.get_epoch_value(), epoch)

    # ------------------------------------------------------------------

    def save_visualization(self, batch_data, vis_payload, global_step: int,
                           prefix: str) -> None:
        """Dump an image|GT|prediction panel for batch sample 0 every
        ``image_dump_interval`` steps (reference: trainer.py:499-548).
        Positive clicks drawn green, negatives red; GT ignore pixels 0.25."""
        import cv2

        vis_dir = Path(getattr(self.cfg, "VIS_PATH", "./vis")) / prefix
        if self.task_prefix:
            vis_dir = vis_dir / self.task_prefix
        vis_dir.mkdir(parents=True, exist_ok=True)

        probs, points = jax.device_get(vis_payload)
        image = np.asarray(batch_data["images"][0], dtype=np.float32)
        if not np.issubdtype(batch_data["images"].dtype, np.integer):
            image = image * 255.0  # [0,1] floats; uint8 batches are 0..255
        gt = np.asarray(batch_data["instances"][0, ..., 0], dtype=np.float32)
        gt[gt < 0] = 0.25

        n_pos = self.max_interactive_points or points.shape[0] // 2
        panel_img = draw_points(image, points[:n_pos], (0, 255, 0))
        panel_img = draw_points(panel_img, points[n_pos:], (255, 0, 0))
        panel = np.hstack([
            np.clip(panel_img, 0, 255).astype(np.uint8),
            draw_probmap(gt),
            draw_probmap(np.asarray(probs, dtype=np.float32)),
        ])
        cv2.imwrite(str(vis_dir / f"{global_step:06d}_instance_segmentation.jpg"),
                    panel[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 85])

    def _ensure_writer(self):
        if self.sw is None and self.is_master and getattr(
            self.cfg, "LOGS_PATH", None
        ):
            try:
                from isegprobe_tpu.utils.log import SummaryWriterAvg

                self.sw = SummaryWriterAvg(log_dir=str(self.cfg.LOGS_PATH),
                                           dump_period=self.tb_dump_period)
            except ImportError:
                self.sw = None

    def full_params(self) -> Dict:
        p = jax.device_get(self.params)
        return {**p["trainable"], **p["frozen"]}

    def save_checkpoint(self, epoch: Optional[int] = None) -> None:
        """last_checkpoint + interval-scheduled epoch checkpoints
        (reference: trainer.py:289-311), filtered by the model's save_cfg."""
        from isegprobe_tpu.models.probe_model import filter_state_dict

        ckpt_dir = Path(getattr(self.cfg, "CHECKPOINTS_PATH", "./checkpoints"))
        params = self.full_params()
        save_cfg = getattr(self.model, "save_cfg", None)
        filtered = filter_state_dict(params, save_cfg)
        config = model_config(self.model)
        extra = {"epoch": epoch}

        save_checkpoint(filtered, config, ckpt_dir / "last_checkpoint.ckpt", extra)
        if epoch is not None and self._scheduled_epoch(epoch):
            save_checkpoint(filtered, config, ckpt_dir / f"{epoch:03d}.ckpt", extra)

    def _scheduled_epoch(self, epoch: int) -> bool:
        ci = self.checkpoint_interval
        if isinstance(ci, (int, float)):
            return (epoch + 1) % int(ci) == 0
        # interval schedule [[start_epoch, every], ...] (train_cfg.yaml:23)
        result = False
        for start, every in ci:
            if epoch >= start:
                result = (epoch + 1) % every == 0
        return result
