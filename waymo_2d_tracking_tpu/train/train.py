"""Detector training loop (components C23/C26): optax + pjit DP + orbax.

train_step is one jitted function with sharding annotations: batch sharded
over the mesh 'data' axis, params/opt-state replicated — XLA inserts the
gradient all-reduce over ICI (replacing the reference's NCCL DDP,
SURVEY.md §2.3). BatchNorm runs in train mode with per-shard statistics
(the usual DP convention). Checkpointing is orbax (async-capable),
replacing torch.save.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from waymo_2d_tracking_tpu.config import Config, TrainConfig
from waymo_2d_tracking_tpu.models.detector import Detector
from waymo_2d_tracking_tpu.parallel import sharding as shd
from waymo_2d_tracking_tpu.train.losses import (
    fcos_loss,
    reid_supcon_loss,
    reid_triplet_loss,
)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # EMA of params for eval/export (empty dict when train.ema_decay == 0)
    ema_params: Any = struct.field(default_factory=dict)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=cfg.total_steps,
    )
    if cfg.optimizer == "adamw":
        opt = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        # detection classic (the reference era trained ResNet detectors
        # with SGD momentum + weight decay). wd is added BEFORE the
        # momentum transform, i.e. COUPLED L2 regularization — exactly
        # torch.optim.SGD's semantics (not decoupled SGDW)
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=cfg.sgd_momentum, nesterov=False),
        )
    else:
        raise ValueError(
            f"train.optimizer must be 'adamw' or 'sgd', got "
            f"{cfg.optimizer!r}")
    return optax.chain(optax.clip_by_global_norm(10.0), opt)


class DetectorTrainer:
    """Owns the model, optimizer, jitted train_step, and checkpointing."""

    def __init__(self, cfg: Config, mesh=None):
        self.cfg = cfg
        self.model = Detector(cfg.detector, remat=cfg.train.remat)
        self.tx = make_optimizer(cfg.train)
        self.mesh = mesh
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))

    def create_state(self, rng, batch_size: int = 2) -> TrainState:
        h, w = self.cfg.detector.image_size
        images = jnp.zeros((batch_size, h, w, 3), jnp.float32)
        variables = self.model.init(rng, images, method=Detector.init_all)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        state = TrainState(
            step=jnp.int32(0),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            # distinct buffers: the train step donates the whole state, and
            # aliasing ema_params to params would donate each buffer twice
            ema_params=(jax.tree.map(jnp.copy, params)
                        if self.cfg.train.ema_decay > 0 else {}),
        )
        if self.mesh is not None:
            state = shd.replicate(state, self.mesh)
        return state

    def _grads_and_stats(self, params, batch_stats, batch):
        """(grads, new_batch_stats, metrics) for one update — honoring
        grad_accum_steps (callable directly; oracle-tested)."""
        reid_on = (
            self.cfg.train.reid_loss_weight > 0
            and self.cfg.detector.embed_dim > 0
            and "gt_track_ids" in batch
        )

        def loss_fn(params, batch_stats, batch):
            from waymo_2d_tracking_tpu.models.detector import Detector

            (head_out, gt_embeds), updates = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["images"],
                rois=batch["gt_boxes"] if reid_on else None,
                method=Detector.forward_train,
                mutable=["batch_stats"],
            )
            if self.cfg.detector.head_family == "centernet":
                from waymo_2d_tracking_tpu.models.centernet import (
                    centernet_loss,
                )

                loss, metrics = centernet_loss(
                    head_out,
                    batch["gt_boxes"],
                    batch["gt_classes"],
                    batch["gt_valid"],
                    num_classes=self.cfg.detector.num_classes,
                )
            else:
                loss, metrics = fcos_loss(
                    head_out,
                    batch["gt_boxes"],
                    batch["gt_classes"],
                    batch["gt_valid"],
                    num_classes=self.cfg.detector.num_classes,
                    focal_alpha=self.cfg.train.focal_alpha,
                    focal_gamma=self.cfg.train.focal_gamma,
                )
            if reid_on:
                if self.cfg.train.reid_loss == "triplet":
                    reid_l, n_active = reid_triplet_loss(
                        gt_embeds, batch["gt_track_ids"], batch["gt_valid"],
                        margin=self.cfg.train.reid_margin,
                    )
                elif self.cfg.train.reid_loss == "supcon":
                    reid_l, n_active = reid_supcon_loss(
                        gt_embeds, batch["gt_track_ids"], batch["gt_valid"],
                        temperature=self.cfg.train.reid_temperature,
                    )
                else:
                    raise ValueError(
                        "train.reid_loss must be 'supcon' or 'triplet', "
                        f"got {self.cfg.train.reid_loss!r}")
                loss = loss + self.cfg.train.reid_loss_weight * reid_l
                metrics = dict(metrics, reid_loss=reid_l,
                               reid_active=n_active)
            return loss, (metrics, updates["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        accum = self.cfg.train.grad_accum_steps
        if accum <= 1:
            (_, (metrics, new_stats)), grads = grad_fn(
                params, batch_stats, batch)
        else:
            # gradient accumulation: split the batch into `accum`
            # micro-batches and lax.scan the backward over them — only one
            # micro-batch's activations are live at a time (composes with
            # remat), trading steps/sec for effective batch size. BN stats
            # update sequentially per micro-batch (the torch convention).
            # Grads are the POSITIVES-WEIGHTED mean over micro-batches, not
            # the plain mean (review r4): the detection loss normalizes by
            # each micro-batch's own num_pos, so a plain mean would weight a
            # sparse micro-batch's per-positive gradients far above the
            # accum=1 run on the identical batch — weighting by
            # max(num_pos, 1) recovers sum(loss_sums)/total_pos, the
            # full-batch detection objective (exactly, when every
            # micro-batch has >=1 positive; BN batch-statistics sequencing
            # aside).
            n = batch["images"].shape[0]
            if n % accum != 0:
                raise ValueError(
                    f"batch size {n} not divisible by "
                    f"grad_accum_steps={accum}")
            micro = n // accum
            stacked = jax.tree.map(
                lambda x: x.reshape((accum, micro) + x.shape[1:]), batch)

            def micro_step(carry, mb):
                stats, gsum, wsum = carry
                (_, (m, stats)), g = grad_fn(params, stats, mb)
                w = jnp.maximum(m["num_pos"], 1.0)
                gsum = jax.tree.map(lambda a, b: a + w * b, gsum, g)
                return (stats, gsum, wsum + w), m

            gzero = jax.tree.map(jnp.zeros_like, params)
            (new_stats, gsum, wsum), metrics_seq = jax.lax.scan(
                micro_step, (batch_stats, gzero, jnp.float32(0.0)), stacked)
            grads = jax.tree.map(lambda g: g / wsum, gsum)
            metrics = jax.tree.map(lambda x: jnp.mean(x, axis=0),
                                   metrics_seq)
        return grads, new_stats, metrics

    def _train_step_impl(
        self, state: TrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """batch: images (N,H,W,3), gt_boxes (N,G,4), gt_classes (N,G),
        gt_valid (N,G). Sharded over 'data' by the caller; params replicated
        => XLA derives the grad all-reduce."""
        grads, new_stats, metrics = self._grads_and_stats(
            state.params, state.batch_stats, batch)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = self.cfg.train.ema_decay
        if d > 0:
            # bias-corrected decay ramp (standard warmup: effective decay
            # grows from 0 toward d over the first ~1/(1-d) steps)
            step = state.step + 1
            d_t = jnp.minimum(d, (1.0 + step) / (10.0 + step))
            new_ema = jax.tree.map(
                lambda e, p: e * d_t + p * (1.0 - d_t),
                state.ema_params, new_params,
            )
        else:
            new_ema = state.ema_params
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, metrics

    def train_step(self, state, batch):
        if self.mesh is not None:
            batch = shd.shard_batch(batch, self.mesh)
        return self._train_step(state, batch)

    def eval_variables(self, state: TrainState):
        """Variables dict for inference/export: EMA params when enabled
        (train.ema_decay > 0), else the raw params."""
        params = state.ema_params if self.cfg.train.ema_decay > 0 else state.params
        return {"params": params, "batch_stats": state.batch_stats}

    # ------------------------------------------------------------ checkpoint

    def save_checkpoint(self, state: TrainState, path: Optional[str] = None,
                        exact_path: bool = False):
        """Save under <path>/step_N, or exactly at <path> (exact_path=True —
        used for the replace-in-place <checkpoint_dir>/best artifact)."""
        import orbax.checkpoint as ocp

        path = path or self.cfg.train.checkpoint_dir
        if not exact_path:
            path = f"{path}/step_{int(state.step)}"
        # orbax requires absolute paths (raises ValueError otherwise) — a
        # relative train.checkpoint_dir used to crash at the FIRST save,
        # after a full checkpoint_every of training work (review r4)
        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, path: str, template: TrainState) -> TrainState:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        try:
            return ckptr.restore(os.path.abspath(path),
                                 jax.device_get(template))
        except (ValueError, KeyError) as e:
            # A pytree/structure mismatch has several possible causes; the
            # common one since the round-2 default flip conv7 -> s2d
            # (ADVICE r2) is a checkpoint saved under the other stem.
            # Surface the guidance WITHOUT asserting the diagnosis —
            # substring-sniffing the orbax error was shown to misattribute
            # unrelated mismatches (e.g. fpn_channels) to the stem.
            raise ValueError(
                f"checkpoint at {path} does not match the current config's "
                "parameter tree. If the checkpoint predates the s2d stem "
                "default (or was imported from torch by hand), restore with "
                "detector.stem=conv7 or convert exactly via "
                "models.resnet.convert_stem_to_s2d / `w2t import-weights`; "
                "otherwise check width/depth/class-count settings against "
                f"the training config. Original error: {e}"
            ) from e


def evaluate_detector(
    trainer: DetectorTrainer,
    state: TrainState,
    val_batches,
    runner=None,
) -> Dict[str, float]:
    """Held-out detection AP with the eval (EMA when enabled) variables.

    val_batches: iterable of train-format batches (images/gt_boxes/
    gt_classes/gt_valid) — typically a small materialized list so repeated
    evaluations see the same data. Returns eval/ap.evaluate_detections'
    summary (mAP/AP50/AP75/per-class).
    """
    import numpy as np

    from waymo_2d_tracking_tpu.eval.ap import evaluate_detections

    if runner is None:
        from waymo_2d_tracking_tpu.models.detector import DetectorRunner

        runner = DetectorRunner(trainer.cfg.detector)
    variables = trainer.eval_variables(state)
    if trainer.mesh is not None:
        # mesh-replicated state: pull to host so the (unsharded) detect
        # jit sees plain arrays instead of GSPMD-replicated ones
        variables = jax.device_get(variables)
    preds, gts = [], []
    for bi, batch in enumerate(val_batches):
        dets = runner.detect(variables, batch["images"])
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        classes = np.asarray(dets.classes)
        valid = np.asarray(dets.valid).astype(bool)
        gt_boxes = np.asarray(batch["gt_boxes"])
        gt_classes = np.asarray(batch["gt_classes"])
        gt_valid = np.asarray(batch["gt_valid"]).astype(bool)
        for n in range(boxes.shape[0]):
            key = (bi, n)
            v = valid[n]
            preds.append((key, boxes[n][v], scores[n][v], classes[n][v]))
            g = gt_valid[n]
            gts.append((key, gt_boxes[n][g], gt_classes[n][g]))
    return evaluate_detections(preds, gts,
                               num_classes=trainer.cfg.detector.num_classes)


def train_loop(
    trainer: DetectorTrainer,
    data_iter,
    num_steps: int,
    state: Optional[TrainState] = None,
    log_every: int = 50,
    checkpoint_every: Optional[int] = None,
    log_fn=print,
    val_batches=None,
    val_every: Optional[int] = None,
    save_best: bool = True,
):
    """Simple host loop: one dispatch per step, periodic logging/checkpoint.

    When val_batches (+ val_every) is given, runs a held-out detection-AP
    evaluation every val_every steps (and at the end); with save_best, the
    best-mAP state is checkpointed to <checkpoint_dir>/best — the model-
    selection artifact `w2t detect/track --params` can load directly.
    """
    import os

    if state is None:
        state = trainer.create_state(jax.random.PRNGKey(0))
    best_map = float("-inf")
    runner = None
    for i in range(num_steps):
        batch = next(data_iter)
        state, metrics = trainer.train_step(state, batch)
        step = int(state.step)
        # state.step is absolute and survives restore; "end of training" is
        # the relative loop position, not step == num_steps
        is_last = i == num_steps - 1
        if step % log_every == 0 or is_last:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            log_fn(f"step {step}: " + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
        if checkpoint_every and step % checkpoint_every == 0:
            trainer.save_checkpoint(state)
        if (val_batches is not None and val_every
                and (step % val_every == 0 or is_last)):
            if runner is None:
                from waymo_2d_tracking_tpu.models.detector import (
                    DetectorRunner,
                )

                runner = DetectorRunner(trainer.cfg.detector)
            res = evaluate_detector(trainer, state, val_batches,
                                    runner=runner)
            log_fn(f"step {step}: val " + " ".join(
                f"{k}={v:.4f}" for k, v in sorted(res.items())))
            if save_best and res.get("mAP", float("nan")) > best_map:
                best_map = res["mAP"]
                trainer.save_checkpoint(
                    state,
                    os.path.join(trainer.cfg.train.checkpoint_dir, "best"),
                    exact_path=True)
    return state
