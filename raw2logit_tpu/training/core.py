"""Training core: state, pjit-compiled train/eval steps.

Functional equivalent of the reference's LitModel (model.py:26-151) +
pl.Trainer loop (train.py:361-378), re-designed TPU-first:

  * the WHOLE raw->logit chain (processor + augmentation + task model +
    loss + adversarial aux loss) is ONE jitted graph per step — no process
    boundary between ISP and model (the reference splits them across
    DataLoader workers and the GPU for static mode, train.py:163-173);
  * freezing (freeze_processor / freeze_classifier / adv_parameters name
    targeting, model.py:64-75) is an optax mask, not requires_grad;
  * adversarial mode: negated task loss + aux regularization toward a frozen
    default processor's output (train.py:241-273), with the frozen
    processor's forward fused into the same step;
  * data parallelism: jit with sharded batch over a 1-D mesh; XLA inserts
    the gradient all-reduce over ICI.
"""

import dataclasses
from typing import Any, Callable

import flax.struct
import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from raw2logit_tpu import losses as L
from raw2logit_tpu.augment import get_augmentation


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    task: str = "classification"          # 'classification' | 'segmentation'
    lr: float = 1e-5
    lr_schedule: str = "constant"         # 'constant' | 'cosine'
    total_steps: int = 0                  # cosine horizon (train steps)
    weight_decay: float = 0.0
    augmentation: str = "none"            # 'none' | 'weak' | 'strong'
    augmentation_on_eval: bool = False
    freeze_processor: bool = False
    freeze_classifier: bool = False
    adv_training: bool = False
    adv_aux_weight: float = 1.0
    adv_aux_loss: str = "ssim"            # 'l2' | 'ssim'
    adv_parameters: str = "all"           # 'all' | param-name substring
    loss_weight: float = 1.0              # -1 with adv_training


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    proc_params: Any
    proc_stats: Any
    clf_params: Any
    clf_stats: Any
    opt_state: Any
    # frozen default processor params for adversarial regularization
    ref_proc_params: Any = None
    ref_proc_stats: Any = None


def _param_labels(params, cfg: TrainConfig, which: str):
    """Label each param leaf 'train'/'freeze'.

    Mirrors LitModel freezing: freeze_* flags (model.py:64-68) and
    adversarial per-parameter name-substring targeting (model.py:70-75).
    """
    frozen_all = (cfg.freeze_processor if which == "proc"
                  else cfg.freeze_classifier)

    def label(path, _leaf):
        if frozen_all:
            return "freeze"
        if which == "proc" and cfg.adv_training and cfg.adv_parameters != "all":
            names = "/".join(str(getattr(p, "key", p)) for p in path)
            return "train" if cfg.adv_parameters in names else "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg: TrainConfig, proc_params, clf_params,
                   flat: bool = False, split: bool = False):
    """Single Adam over (processor, classifier) with freeze masks
    (model.py:144-146: torch.optim.Adam(self.parameters(), lr, wd)).

    torch Adam's weight_decay is COUPLED L2 (wd*param added to the
    gradient before the moment updates) — optax.add_decayed_weights in
    front of adam, not adamw's decoupled decay.

    flat=True runs the mathematically identical update over ONE raveled
    parameter vector (Adam is elementwise, so flat-vs-per-leaf is
    bitwise identical; frozen leaves see a zeroed gradient and zero
    moments give exactly zero updates). It was built on the theory that
    per-leaf launch overheads dominate (3.5 ms measured vs a 1.0 ms HBM
    roofline at ResNet-18 scale), but MEASURED SLOWER on the chip:
    7.0 ms vs 3.4 ms per apply (tools/opt_micro.py, batch-independent)
    — the grads/params ravel and update unravel are ~100 small HBM
    copies each that cost more than the per-leaf fusions they replace.
    Kept for the equivalence test; per-leaf is the default.

    split=True returns a (tx_proc, tx_clf) PAIR of independent
    transformations, one per module. Adam (with coupled L2 and freeze
    masks) is per-leaf: the update of any leaf depends only on that
    leaf's gradient/param/moments, so the pair is exactly the joint
    optimizer restricted to each side (same trajectories, leaf for
    leaf). The split form is what lets the staged train step fold the
    optimizer apply INTO the two gradient programs (fuse_opt): the clf
    half updates inside clf_grad, the ISP half inside isp_bwd, and the
    standalone opt_apply program (measured 3.4-5.5 ms/step at ResNet-18
    scale vs a 1.0 ms HBM roofline — per-program launch overhead plus a
    grads round-trip through HBM) disappears."""
    def _lr():
        """Constant (the reference's Adam) or cosine-to-zero over
        cfg.total_steps — small-data sweep recipes need the FINAL state
        converged (constant-lr val accuracy oscillates at 6 steps/epoch),
        and the final state is what gets checkpointed and A/B-evaluated."""
        if cfg.lr_schedule == "cosine":
            if cfg.total_steps <= 0:
                raise ValueError("lr_schedule='cosine' needs total_steps")
            return optax.cosine_decay_schedule(cfg.lr, cfg.total_steps)
        return cfg.lr

    if split:
        def _side(params, which):
            if cfg.weight_decay:
                train_tx = optax.chain(
                    optax.add_decayed_weights(cfg.weight_decay),
                    optax.adam(_lr()))
            else:
                train_tx = optax.adam(_lr())
            return optax.multi_transform(
                {"train": train_tx, "freeze": optax.set_to_zero()},
                param_labels=_param_labels(params, cfg, which))
        return _side(proc_params, "proc"), _side(clf_params, "clf")

    labels = (
        _param_labels(proc_params, cfg, "proc"),
        _param_labels(clf_params, cfg, "clf"),
    )
    if not flat:
        if cfg.weight_decay:
            train_tx = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.adam(_lr()))
        else:
            train_tx = optax.adam(_lr())
        return optax.multi_transform(
            {"train": train_tx, "freeze": optax.set_to_zero()},
            param_labels=labels)

    params0 = (proc_params, clf_params)
    _, unravel = jax.flatten_util.ravel_pytree(params0)
    any_frozen = any(
        lbl == "freeze"
        for lbl in jax.tree_util.tree_leaves(labels, is_leaf=lambda x:
                                             isinstance(x, str)))
    if any_frozen:
        mask_tree = jax.tree_util.tree_map(
            lambda lbl, p: jnp.full(jnp.shape(p), lbl == "train",
                                    jnp.result_type(p)),
            labels, params0)
        mask_flat = jax.flatten_util.ravel_pytree(mask_tree)[0]
    else:
        mask_flat = None
    inner = optax.adam(_lr())

    def init(params):
        flat = jax.flatten_util.ravel_pytree(params)[0]
        return inner.init(flat)

    def update(grads, state, params=None):
        g = jax.flatten_util.ravel_pytree(grads)[0]
        if cfg.weight_decay:
            g = g + cfg.weight_decay * jax.flatten_util.ravel_pytree(
                params)[0]
        if mask_flat is not None:
            g = g * mask_flat
        u, new_state = inner.update(g, state)
        return unravel(u), new_state

    return optax.GradientTransformation(init, update)


def task_loss_fn(cfg: TrainConfig) -> Callable:
    base = (L.cross_entropy_loss if cfg.task == "classification"
            else L.dice_loss)
    return L.weighted_loss(base, cfg.loss_weight)


def create_train_state(cfg, processor, classifier, sample_raw, rng,
                       processor_variables=None, classifier_variables=None,
                       split_opt=False):
    """Initialize params/batch-stats for both modules and the optimizer.

    The whole initialization is ONE jitted program: under remote-compile
    TPU backends, eager flax init would pay a compile round-trip per op.
    """
    def _init(rng):
        k1, k2 = jax.random.split(rng)
        if processor_variables is not None:
            pvars = processor_variables
        elif processor is not None:
            pvars = processor.init(k1, sample_raw, train=False)
        else:
            pvars = {}
        if classifier_variables is not None:
            cvars = classifier_variables
        else:
            if processor is not None:
                rgb = processor.apply(pvars, sample_raw, train=False)[0]
            else:
                rgb = sample_raw
            cvars = classifier.init(k2, rgb, train=False)
        return pvars, cvars

    processor_variables, classifier_variables = jax.jit(_init)(rng)
    proc_params = processor_variables.get("params", {})
    proc_stats = processor_variables.get("batch_stats", {})
    clf_params = classifier_variables.get("params", {})
    clf_stats = classifier_variables.get("batch_stats", {})

    if split_opt:
        # per-module optimizer pair for the fuse_opt staged step; the
        # opt_state is the matching (proc_side, clf_side) 2-tuple
        tx = make_optimizer(cfg, proc_params, clf_params, split=True)
        opt_state = (jax.jit(tx[0].init)(proc_params),
                     jax.jit(tx[1].init)(clf_params))
    else:
        tx = make_optimizer(cfg, proc_params, clf_params)
        opt_state = jax.jit(tx.init)((proc_params, clf_params))

    ref_params = ref_stats = None
    if cfg.adv_training:
        # deepcopy-equivalent of the default processor (train.py:248-254)
        ref_params = jax.tree_util.tree_map(jnp.copy, proc_params)
        ref_stats = jax.tree_util.tree_map(jnp.copy, proc_stats)

    state = TrainState(step=jnp.zeros((), jnp.int32),
                       proc_params=proc_params, proc_stats=proc_stats,
                       clf_params=clf_params, clf_stats=clf_stats,
                       opt_state=opt_state,
                       ref_proc_params=ref_params, ref_proc_stats=ref_stats)
    return state, tx


def _forward(cfg, processor, classifier, proc_params, proc_stats,
             clf_params, clf_stats, raw, key, train):
    """processor -> augmentation -> classifier (model.py:77-83), returning
    mutated batch-stats when training (and not frozen/adversarial —
    the reference never updates BN of frozen parts, model.py:136-142)."""
    # train-mode flag per module == "is this part being trained" (the
    # reference keeps frozen parts in eval mode, model.py:136-142);
    # whether batch_stats get MUTATED additionally requires the module to
    # have them — don't conflate the two (a BN-free module must still see
    # train=True so e.g. dropout fires)
    proc_train = train and not cfg.freeze_processor and not cfg.adv_training
    clf_train = train and not cfg.freeze_classifier

    new_proc_stats, new_clf_stats = proc_stats, clf_stats

    if processor is not None:
        pvars = {"params": proc_params, "batch_stats": proc_stats}
        if proc_train and proc_stats:
            (rgb, stages), mut = processor.apply(
                pvars, raw, train=True, mutable=["batch_stats"])
            new_proc_stats = mut["batch_stats"]
        else:
            rgb, stages = processor.apply(pvars, raw, train=proc_train)
    else:
        rgb, stages = raw, {}

    x = rgb
    aug = get_augmentation(cfg.augmentation)
    apply_aug = aug is not None and (train or cfg.augmentation_on_eval)
    if apply_aug:
        x = aug(key, x, is_mask=False)

    cvars = {"params": clf_params}
    if clf_stats:
        cvars["batch_stats"] = clf_stats
    if clf_train and clf_stats:
        logits, mut = classifier.apply(cvars, x, train=True,
                                       mutable=["batch_stats"])
        new_clf_stats = mut["batch_stats"]
    else:
        logits = classifier.apply(cvars, x, train=clf_train)

    return logits, rgb, stages, new_proc_stats, new_clf_stats


def _step_metrics(cfg, logits, y):
    if cfg.task == "classification":
        return {"accuracy": L.accuracy(logits, y)}
    probs = jax.nn.sigmoid(logits)
    return {"iou_score": L.iou_score(probs, y)}


def make_train_step(cfg: TrainConfig, processor, classifier, tx,
                    donate: bool = True):
    """Build the jitted train step: (state, raw, y, key) -> (state, metrics).

    raw: (B, H, W) mosaics (or (B, H, W, C) pre-processed RGB when
    processor is None / static-on-host). y: integer labels (B,) or masks
    (B, H, W).
    """
    loss_fn_task = task_loss_fn(cfg)
    aux_fn = (L.aux_loss(cfg.adv_aux_loss, cfg.adv_aux_weight)
              if cfg.adv_training else None)
    aug = get_augmentation(cfg.augmentation)

    def step(state: TrainState, raw, y, key):
        def loss_fn(trainable):
            proc_params, clf_params = trainable
            logits, rgb, _, new_ps, new_cs = _forward(
                cfg, processor, classifier, proc_params, state.proc_stats,
                clf_params, state.clf_stats, raw, key, train=True)

            y_t = y
            if cfg.task == "segmentation" and aug is not None:
                # replay the same geometric transforms on the mask
                # (model.py:90-92 via ComposeState state retention)
                y_t = aug(key, y_t, is_mask=True)

            if cfg.task == "segmentation" and logits.shape[-1] == 1:
                logits_t = logits[..., 0]
            else:
                logits_t = logits
            loss = loss_fn_task(logits_t, y_t)

            loss_aux = jnp.zeros(())
            if aux_fn is not None:
                ref_rgb, _ = processor.apply(
                    {"params": state.ref_proc_params,
                     "batch_stats": state.ref_proc_stats},
                    raw, train=False)
                loss_aux = aux_fn(ref_rgb, rgb)
                loss = loss + loss_aux

            mets = _step_metrics(cfg, logits_t, y_t)
            mets["loss"] = loss
            mets["loss_aux"] = loss_aux
            return loss, (new_ps, new_cs, mets)

        grads, (new_ps, new_cs, mets) = jax.grad(
            loss_fn, has_aux=True)((state.proc_params, state.clf_params))
        updates, new_opt = tx.update(
            grads, state.opt_state, (state.proc_params, state.clf_params))
        new_proc, new_clf = optax.apply_updates(
            (state.proc_params, state.clf_params), updates)
        new_state = state.replace(step=state.step + 1,
                                  proc_params=new_proc, clf_params=new_clf,
                                  proc_stats=new_ps, clf_stats=new_cs,
                                  opt_state=new_opt)
        return new_state, mets

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_staged_train_step(cfg: TrainConfig, processor, classifier, tx,
                           donate: bool = True, fuse_opt: bool = False,
                           isp_residuals: bool = False):
    """Compile-budget-constrained variant of make_train_step.

    The identical mathematical update (chain rule through ISP -> aug ->
    model -> loss, then one Adam apply) split into FOUR separately-jitted
    programs: ISP forward, classifier value-and-grad (returning the rgb
    cotangent), ISP vjp, optimizer apply. Each program is a fraction of
    the monolithic step's HLO, so on backends where compilation is the
    bottleneck (this environment's remote TPU compiler) every piece fits a
    compile-budget window and lands in the persistent cache independently.
    Costs one ISP recompute (cheap next to the model) and 4 dispatches.

    Adversarial mode (train.py:241-273) adds ONE small extra program: the
    frozen default processor's forward reuses the isp_fwd program (proc BN
    is frozen in adv mode either way, model.py:136-142), and aux_grad
    computes the SSIM/l2 regularizer value plus its rgb cotangent, folded
    into the task cotangent before isp_bwd.

    fuse_opt=True folds the optimizer apply INTO the gradient programs:
    `tx` must then be the (tx_proc, tx_clf) pair from
    make_optimizer(split=True) and state.opt_state the matching
    (proc_side, clf_side) tuple (create_train_state(split_opt=True)).
    clf_grad applies the classifier half of the Adam update in-program
    (the grads never round-trip through HBM) and isp_bwd applies the
    ISP half, so the standalone opt_apply program and its per-launch
    overhead disappear. Exact by per-leaf-ness of Adam+masks: every
    leaf's update depends only on that leaf's gradient/param/moments,
    and both sides consume the PRE-update params (coupled L2 included).
    """
    tx_proc = tx_clf = None
    if fuse_opt:
        # a bare GradientTransformation is itself a 2-field NamedTuple, so
        # an isinstance/len check alone would accept the joint optimizer
        # and unpack its (init, update) functions
        if (not (isinstance(tx, tuple) and len(tx) == 2)
                or any(callable(part) for part in tx)):
            raise ValueError("fuse_opt=True needs the (tx_proc, tx_clf) "
                             "pair from make_optimizer(split=True)")
        tx_proc, tx_clf = tx
    loss_fn_task = task_loss_fn(cfg)
    aug = get_augmentation(cfg.augmentation)
    aux_fn = (L.aux_loss(cfg.adv_aux_loss, cfg.adv_aux_weight)
              if cfg.adv_training else None)
    update_proc_bn = not cfg.freeze_processor and not cfg.adv_training
    update_clf_bn = not cfg.freeze_classifier

    def _isp(proc_params, proc_stats, raw):
        if processor is None:
            return raw, proc_stats
        pvars = {"params": proc_params, "batch_stats": proc_stats}
        if update_proc_bn and proc_stats:
            (rgb, _), mut = processor.apply(pvars, raw, train=True,
                                            mutable=["batch_stats"])
            return rgb, mut["batch_stats"]
        rgb, _ = processor.apply(pvars, raw, train=update_proc_bn)
        return rgb, proc_stats

    @jax.jit
    def isp_fwd(proc_params, proc_stats, raw):
        return _isp(proc_params, proc_stats, raw)

    # ---- fast Pallas path: hand the backward program the training
    # forward's residual planes instead of re-running the fused kernel
    # inside its vjp (the custom_vjp recompute cost ~6 ms/step at batch
    # 256 when the programs are split). Only for the fused-kernel
    # processor with the Pallas backward selected (TPU default).
    def _pallas_fast():
        from raw2logit_tpu.pallas.fused_isp import _bwd_choice
        return (processor is not None
                and getattr(processor, "use_pallas", False)
                and not getattr(processor, "track_stages", False)
                and _bwd_choice() == "pallas")

    _KERNEL_KEYS = ("black_level", "debayer", "white_balance",
                    "colour_correction", "sharpening_filter",
                    "gaussian_blur", "gamma_correct")

    fast = _pallas_fast()

    # The fast path keeps the PLANAR (B, 3, H, W) kernel layout across
    # the program boundaries: transposes trapped between two separately-
    # jitted programs materialize (they cannot fuse across the boundary),
    # whereas inside clf_grad the planar->NHWC transpose fuses into the
    # first conv for free. additive/BN run directly on planar.
    #
    # When the processor BN is in TRAIN mode (non-adv, non-frozen), the
    # BN forward moves INTO the classifier program too (clf_grad_bn):
    # its normalize-apply fuses with the boundary transpose + first
    # conv, its backward comes free from the program's autodiff — the
    # standalone BN passes in isp_fwd and the closed-form cotangent
    # passes in isp_bwd (HBM passes over the full activation either
    # way) both disappear, and the program boundary carries one planar
    # tensor (pre) in each direction.
    bn_in_clf = fast and update_proc_bn

    @jax.jit
    def isp_fwd_fast(proc_params, proc_stats, raw):
        from raw2logit_tpu.isp.batchnorm import torch_bn_forward
        from raw2logit_tpu.pallas.fused_isp import (_fused_fwd_planar_train,
                                                    _is_tpu, _pack_params)
        kp = {k: proc_params[k] for k in _KERNEL_KEYS}
        planar, res = _fused_fwd_planar_train(raw, _pack_params(kp),
                                              interpret=not _is_tpu())
        pre = planar
        if "additive_layer" in proc_params:
            pre = pre + jnp.transpose(proc_params["additive_layer"],
                                      (0, 3, 1, 2))
        new_stats = proc_stats
        if "batch_norm" in proc_stats and bn_in_clf:
            # BN runs inside clf_grad_bn; returning pre under both the
            # rgb and pre slots would make XLA materialize a duplicate-
            # output copy (a full extra activation write) — 3-tuple.
            return pre, new_stats, res
        rgb = pre
        if "batch_norm" in proc_stats:
            rgb, bn_stats = torch_bn_forward(
                pre, proc_stats["batch_norm"], training=update_proc_bn,
                axis=1)
            if update_proc_bn:
                new_stats = dict(proc_stats, batch_norm=bn_stats)
        return rgb, new_stats, pre, res

    def _isp_bwd_fast_impl(proc_params, proc_stats, raw, pre, res, d_rgb):
        from raw2logit_tpu.pallas.fused_isp import _is_tpu
        from raw2logit_tpu.pallas.fused_isp_bwd import fused_isp_bwd_pallas
        d_pre = d_rgb
        if "batch_norm" in proc_stats and not bn_in_clf:
            # closed-form BN input-cotangent: the jax.vjp route re-ran the
            # whole BN forward and transposed it; this is one reduction
            # pass + one elementwise pass, all in the kernel's planar
            # layout. With bn_in_clf the incoming cotangent is already
            # d(pre) — BN's backward ran inside clf_grad_bn's autodiff.
            from raw2logit_tpu.isp.batchnorm import bn_input_cotangent
            d_pre = bn_input_cotangent(pre, d_rgb,
                                       proc_stats["batch_norm"],
                                       training=update_proc_bn, axis=1)
        kp = {k: proc_params[k] for k in _KERNEL_KEYS}
        _, dkp = fused_isp_bwd_pallas(raw, kp, d_pre,
                                      interpret=not _is_tpu(), res=res,
                                      planar=True)
        grads = dict(dkp)
        if "additive_layer" in proc_params:
            grads["additive_layer"] = jnp.transpose(
                jnp.sum(d_pre, axis=0, keepdims=True), (0, 2, 3, 1))
        return {k: grads[k] for k in proc_params}

    isp_bwd_fast = jax.jit(_isp_bwd_fast_impl)

    def _clf_loss_tail(clf_params, clf_stats, x, y, key):
        """Aug replay -> classifier -> loss/metrics: the part of the
        gradient programs shared by the plain and bn_in_clf variants."""
        if aug is not None:
            x = aug(key, x, is_mask=False)
        y_t = y
        if cfg.task == "segmentation" and aug is not None:
            y_t = aug(key, y_t, is_mask=True)
        cvars = {"params": clf_params}
        if clf_stats:
            cvars["batch_stats"] = clf_stats
        if update_clf_bn and clf_stats:
            logits, mut = classifier.apply(cvars, x, train=True,
                                           mutable=["batch_stats"])
            new_cs = mut["batch_stats"]
        else:
            logits = classifier.apply(cvars, x, train=update_clf_bn)
            new_cs = clf_stats
        if cfg.task == "segmentation" and logits.shape[-1] == 1:
            logits = logits[..., 0]
        loss = loss_fn_task(logits, y_t)
        mets = _step_metrics(cfg, logits, y_t)
        mets["loss"] = loss
        mets["loss_aux"] = jnp.zeros(())
        return loss, new_cs, mets

    def _clf_grad_impl(clf_params, clf_stats, rgb, y, key):
        def loss_fn(clf_params, rgb):
            x = rgb
            if fast:
                # planar program boundary; this transpose (and its
                # cotangent twin) fuses into the model's first conv
                x = jnp.transpose(x, (0, 2, 3, 1))
            loss, new_cs, mets = _clf_loss_tail(clf_params, clf_stats,
                                                x, y, key)
            return loss, (new_cs, mets)

        grads, (new_cs, mets) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True)(clf_params, rgb)
        return grads[0], grads[1], new_cs, mets

    clf_grad = jax.jit(_clf_grad_impl)

    def _clf_grad_bn_impl(clf_params, clf_stats, pre, bn_stats, y, key):
        """clf_grad with the processor's train-mode BN folded in (see
        bn_in_clf above): consumes the planar pre-BN tensor, returns its
        cotangent plus the updated BN running stats."""
        from raw2logit_tpu.isp.batchnorm import torch_bn_forward

        def loss_fn(clf_params, pre):
            rgb, new_bn = torch_bn_forward(pre, bn_stats, training=True,
                                           axis=1)
            # planar program boundary; this transpose (and its cotangent
            # twin) fuses into the model's first conv
            x = jnp.transpose(rgb, (0, 2, 3, 1))
            loss, new_cs, mets = _clf_loss_tail(clf_params, clf_stats,
                                                x, y, key)
            return loss, (new_bn, new_cs, mets)

        grads, (new_bn, new_cs, mets) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True)(clf_params, pre)
        return grads[0], grads[1], new_bn, new_cs, mets

    clf_grad_bn = jax.jit(_clf_grad_bn_impl)

    if fuse_opt:
        # the classifier half of the optimizer runs inside the gradient
        # program: grads stay fused with their consumers instead of being
        # written out, and params/moments donate into their updated
        # selves. The adversarial aux loss never touches clf grads (it is
        # a function of the processor OUTPUT only, model.py:94-98), so
        # fusing before aux_grad is exact in adv mode too.
        def _clf_apply(clf_params, clf_g, clf_opt):
            updates, new_opt = tx_clf.update(clf_g, clf_opt, clf_params)
            return optax.apply_updates(clf_params, updates), new_opt

        def _clf_grad_opt_impl(clf_params, clf_stats, rgb, y, key,
                               clf_opt):
            clf_g, d_rgb, new_cs, mets = _clf_grad_impl(
                clf_params, clf_stats, rgb, y, key)
            new_clf, new_opt = _clf_apply(clf_params, clf_g, clf_opt)
            return new_clf, new_opt, d_rgb, new_cs, mets

        def _clf_grad_bn_opt_impl(clf_params, clf_stats, pre, bn_stats,
                                  y, key, clf_opt):
            clf_g, d_pre, new_bn, new_cs, mets = _clf_grad_bn_impl(
                clf_params, clf_stats, pre, bn_stats, y, key)
            new_clf, new_opt = _clf_apply(clf_params, clf_g, clf_opt)
            return new_clf, new_opt, d_pre, new_bn, new_cs, mets

        clf_grad_opt = jax.jit(
            _clf_grad_opt_impl,
            donate_argnums=(0, 5) if donate else ())
        clf_grad_bn_opt = jax.jit(
            _clf_grad_bn_opt_impl,
            donate_argnums=(0, 6) if donate else ())

    # SSIM aux on the fast (planar Pallas) path runs as ONE fused kernel
    # computing the value and the rgb cotangent together: XLA's separable
    # window convs round-trip every pass through HBM (28.6 ms at batch
    # 256, 77% HBM util, results/profile_step_adv.json) where the kernel
    # measures 17.7 ms at the VPU tap bound — and the planar layout drops
    # the NHWC boundary transposes (pallas/ssim_aux.py; parity vs
    # jax.grad of ops/ssim.py in tests/test_pallas.py).
    aux_kernel = aux_fn is not None and fast and cfg.adv_aux_loss == "ssim"

    @jax.jit
    def aux_grad(ref_rgb, rgb, d_rgb, task_loss):
        """Adversarial regularizer value + rgb cotangent, fused with the
        cotangent accumulation and the loss total (one tiny program; an
        eager add would pay its own remote compile)."""
        if aux_kernel:
            from raw2logit_tpu.pallas.fused_isp import _is_tpu
            from raw2logit_tpu.pallas.ssim_aux import ssim_aux_value_grad
            loss_aux, g = ssim_aux_value_grad(
                jax.lax.stop_gradient(ref_rgb), rgb, cfg.adv_aux_weight,
                interpret=not _is_tpu())
            return loss_aux, task_loss + loss_aux, d_rgb + g

        def f(r):
            if fast:
                # planar boundary: the aux losses (SSIM windows) are
                # defined on channel-last images
                return aux_fn(jnp.transpose(ref_rgb, (0, 2, 3, 1)),
                              jnp.transpose(r, (0, 2, 3, 1)))
            return aux_fn(ref_rgb, r)

        loss_aux, g = jax.value_and_grad(f)(rgb)
        return loss_aux, task_loss + loss_aux, d_rgb + g

    def _isp_bwd_impl(proc_params, proc_stats, raw, d_rgb):
        def rgb_of(p):
            return _isp(p, proc_stats, raw)[0]
        _, vjp = jax.vjp(rgb_of, proc_params)
        return vjp(d_rgb)[0]

    isp_bwd = jax.jit(_isp_bwd_impl)

    # ---- saved-residual generic path (isp_residuals=True): pass the ISP
    # vjp residuals across the program boundary instead of recomputing
    # the processor forward inside isp_bwd's vjp — for the NEURAL
    # processor that recompute is 1.55 TFLOP of a 6.4 TFLOP step
    # (results/profile_step_neural.json). jax.closure_convert turns the
    # vjp closure into (pure_fn, consts): isp_fwd_res emits the consts,
    # isp_bwd_res re-derives the identical pure_fn by tracing the same
    # code (its own consts computation is dead code XLA removes) and
    # replays it on the saved ones.
    #
    # MEASURED ON THE TUNNELED v5e: 287.8 ms/step vs 135.0 recompute-
    # staged vs 108.6 monolithic (batch-64 neural family,
    # results/nn_isp_step_tpu*.json) — the ~285 residual arrays crossing
    # the boundary pay this backend's tiled program-output copies, which
    # cost far more than the recompute they save. Kept as an option for
    # backends with cheap program I/O; prefer the MONOLITH for the
    # neural family when the compile budget allows (NN_MONOLITH in
    # tools/nn_isp_micro.py).
    def _vjp_conv(proc_params, proc_stats, raw, g_example):
        def rgb_of(p):
            return _isp(p, proc_stats, raw)[0]
        _, vjp_fn = jax.vjp(rgb_of, proc_params)
        return jax.closure_convert(lambda g: vjp_fn(g)[0], g_example)

    def _isp_fwd_res_impl(proc_params, proc_stats, raw):
        rgb, new_ps = _isp(proc_params, proc_stats, raw)
        _, consts = _vjp_conv(proc_params, proc_stats, raw, rgb)
        return rgb, new_ps, consts

    isp_fwd_res = jax.jit(_isp_fwd_res_impl)

    def _isp_bwd_res_impl(proc_params, proc_stats, raw, consts, d_rgb):
        f, _ = _vjp_conv(proc_params, proc_stats, raw, d_rgb)
        return f(d_rgb, *consts)

    isp_bwd_res = jax.jit(_isp_bwd_res_impl)

    isp_res = bool(isp_residuals) and not fast and processor is not None

    if fuse_opt:
        # ISP half of the optimizer inside the ISP backward program
        # (129 scalars' moments — negligible next to the kernel)
        def _proc_apply(proc_params, proc_g, proc_opt):
            updates, new_opt = tx_proc.update(proc_g, proc_opt,
                                              proc_params)
            return optax.apply_updates(proc_params, updates), new_opt

        def _isp_bwd_fast_opt_impl(proc_params, proc_stats, raw, pre,
                                   res, d_rgb, proc_opt):
            proc_g = _isp_bwd_fast_impl(proc_params, proc_stats, raw,
                                        pre, res, d_rgb)
            return _proc_apply(proc_params, proc_g, proc_opt)

        def _isp_bwd_opt_impl(proc_params, proc_stats, raw, d_rgb,
                              proc_opt):
            proc_g = _isp_bwd_impl(proc_params, proc_stats, raw, d_rgb)
            return _proc_apply(proc_params, proc_g, proc_opt)

        def _isp_bwd_res_opt_impl(proc_params, proc_stats, raw, consts,
                                  d_rgb, proc_opt):
            proc_g = _isp_bwd_res_impl(proc_params, proc_stats, raw,
                                       consts, d_rgb)
            return _proc_apply(proc_params, proc_g, proc_opt)

        isp_bwd_res_opt = jax.jit(
            _isp_bwd_res_opt_impl,
            donate_argnums=(0, 5) if donate else ())

        # proc_params are consumed by isp_fwd strictly earlier in the
        # step's dispatch order (isp_bwd depends on its outputs), so
        # donating them here matches opt_apply's memory story
        isp_bwd_fast_opt = jax.jit(
            _isp_bwd_fast_opt_impl,
            donate_argnums=(0, 6) if donate else ())
        isp_bwd_opt = jax.jit(
            _isp_bwd_opt_impl,
            donate_argnums=(0, 4) if donate else ())

    def _opt_apply(grads, opt_state, params):
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    # donation: grads/opt_state/params are all dead after this call (the
    # three other programs consumed the old params earlier in the step's
    # dispatch order), so donating matches make_train_step's memory story
    opt_apply = (None if fuse_opt else
                 jax.jit(_opt_apply,
                         donate_argnums=(0, 1, 2) if donate else ()))

    def step(state: TrainState, raw, y, key):
        if fuse_opt:
            proc_opt, clf_opt = state.opt_state
        use_bn_prog = bn_in_clf and "batch_norm" in state.proc_stats
        if use_bn_prog:
            pre, new_ps, res = isp_fwd_fast(
                state.proc_params, state.proc_stats, raw)
            rgb = pre
        elif fast:
            rgb, new_ps, pre, res = isp_fwd_fast(
                state.proc_params, state.proc_stats, raw)
        elif isp_res:
            rgb, new_ps, ires = isp_fwd_res(
                state.proc_params, state.proc_stats, raw)
        else:
            rgb, new_ps = isp_fwd(state.proc_params, state.proc_stats, raw)
        if use_bn_prog:
            if fuse_opt:
                new_clf, new_clf_opt, d_rgb, new_bn, new_cs, mets = \
                    clf_grad_bn_opt(state.clf_params, state.clf_stats, pre,
                                    state.proc_stats["batch_norm"], y, key,
                                    clf_opt)
            else:
                clf_g, d_rgb, new_bn, new_cs, mets = clf_grad_bn(
                    state.clf_params, state.clf_stats, pre,
                    state.proc_stats["batch_norm"], y, key)
            new_ps = dict(new_ps, batch_norm=new_bn)
        elif fuse_opt:
            new_clf, new_clf_opt, d_rgb, new_cs, mets = clf_grad_opt(
                state.clf_params, state.clf_stats, rgb, y, key, clf_opt)
        else:
            clf_g, d_rgb, new_cs, mets = clf_grad(
                state.clf_params, state.clf_stats, rgb, y, key)
        if aux_fn is not None:
            # frozen default pipeline forward — same compiled program as
            # the main forward, applied to the reference params
            # (train.py:248-254)
            if fast:
                ref_rgb = isp_fwd_fast(state.ref_proc_params,
                                       state.ref_proc_stats, raw)[0]
            else:
                ref_rgb, _ = isp_fwd(state.ref_proc_params,
                                     state.ref_proc_stats, raw)
            loss_aux, total, d_rgb = aux_grad(ref_rgb, rgb, d_rgb,
                                              mets["loss"])
            mets = dict(mets, loss=total, loss_aux=loss_aux)
        if fuse_opt:
            if processor is not None and state.proc_params:
                if fast:
                    new_proc, new_proc_opt = isp_bwd_fast_opt(
                        state.proc_params, state.proc_stats, raw, pre,
                        res, d_rgb, proc_opt)
                elif isp_res:
                    new_proc, new_proc_opt = isp_bwd_res_opt(
                        state.proc_params, state.proc_stats, raw, ires,
                        d_rgb, proc_opt)
                else:
                    new_proc, new_proc_opt = isp_bwd_opt(
                        state.proc_params, state.proc_stats, raw, d_rgb,
                        proc_opt)
            else:
                new_proc, new_proc_opt = state.proc_params, proc_opt
            new_opt = (new_proc_opt, new_clf_opt)
        else:
            if processor is not None and state.proc_params:
                if fast:
                    proc_g = isp_bwd_fast(state.proc_params,
                                          state.proc_stats,
                                          raw, pre, res, d_rgb)
                elif isp_res:
                    proc_g = isp_bwd_res(state.proc_params,
                                         state.proc_stats,
                                         raw, ires, d_rgb)
                else:
                    proc_g = isp_bwd(state.proc_params, state.proc_stats,
                                     raw, d_rgb)
            else:
                proc_g = state.proc_params
            (new_proc, new_clf), new_opt = opt_apply(
                (proc_g, clf_g), state.opt_state,
                (state.proc_params, state.clf_params))
        new_state = state.replace(step=state.step + 1,
                                  proc_params=new_proc, clf_params=new_clf,
                                  proc_stats=new_ps, clf_stats=new_cs,
                                  opt_state=new_opt)
        return new_state, mets

    # expose the constituent jitted programs (bench cost analysis,
    # per-program profiling). With fuse_opt the clf_grad/isp_bwd slots
    # hold the optimizer-fused variants (extra opt-side arg, params+opt
    # outputs) and there is no opt_apply program.
    if fast:
        step.programs = {
            "isp_fwd": isp_fwd_fast,
            "clf_grad": clf_grad_opt if fuse_opt else clf_grad,
            "isp_bwd": isp_bwd_fast_opt if fuse_opt else isp_bwd_fast}
        if bn_in_clf:
            # the variant step() uses when the state carries BN stats
            step.programs["clf_grad_bn"] = (clf_grad_bn_opt if fuse_opt
                                            else clf_grad_bn)
    elif isp_res:
        step.programs = {
            "isp_fwd": isp_fwd_res,
            "clf_grad": clf_grad_opt if fuse_opt else clf_grad,
            "isp_bwd": isp_bwd_res_opt if fuse_opt else isp_bwd_res}
    else:
        step.programs = {
            "isp_fwd": isp_fwd,
            "clf_grad": clf_grad_opt if fuse_opt else clf_grad,
            "isp_bwd": isp_bwd_opt if fuse_opt else isp_bwd}
    if not fuse_opt:
        step.programs["opt_apply"] = opt_apply
    if aux_fn is not None:
        step.programs["aux_grad"] = aux_grad
    step.fuse_opt = fuse_opt
    step.isp_residuals = isp_res

    def cost_entries(state, raw, y, key):
        """(program, example_args) pairs covering the step's compute —
        for XLA cost-analysis summation without re-deriving signatures."""
        if fast:
            # planar program boundary
            rgb0 = jnp.zeros((raw.shape[0], 3) + raw.shape[1:],
                             jnp.float32)
        else:
            rgb0 = jnp.zeros(raw.shape + (3,), jnp.float32)
        opt_tail = (state.opt_state[1],) if fuse_opt else ()
        if bn_in_clf and "batch_norm" in state.proc_stats:
            ents = [(clf_grad_bn_opt if fuse_opt else clf_grad_bn,
                     (state.clf_params, state.clf_stats, rgb0,
                      state.proc_stats["batch_norm"], y, key) + opt_tail)]
        else:
            ents = [(clf_grad_opt if fuse_opt else clf_grad,
                     (state.clf_params, state.clf_stats, rgb0,
                      y, key) + opt_tail)]
        proc_tail = (state.opt_state[0],) if fuse_opt else ()
        if fast:
            ents.append((isp_fwd_fast,
                         (state.proc_params, state.proc_stats, raw)))
            res0 = jnp.zeros((raw.shape[0], 5) + raw.shape[1:],
                             jnp.float32)
            ents.append((isp_bwd_fast_opt if fuse_opt else isp_bwd_fast,
                         (state.proc_params, state.proc_stats, raw, rgb0,
                          res0, rgb0) + proc_tail))
        elif isp_res:
            ents.append((isp_fwd_res,
                         (state.proc_params, state.proc_stats, raw)))
            shapes = jax.eval_shape(_isp_fwd_res_impl, state.proc_params,
                                    state.proc_stats, raw)
            ires0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes[2])
            # d_rgb matches the processor's actual output shape (e.g.
            # NNProcessing emits half-resolution RGB), not raw+(3,)
            d0 = jnp.zeros(shapes[0].shape, shapes[0].dtype)
            ents.append((isp_bwd_res_opt if fuse_opt else isp_bwd_res,
                         (state.proc_params, state.proc_stats, raw, ires0,
                          d0) + proc_tail))
        elif processor is not None:
            ents.append((isp_fwd,
                         (state.proc_params, state.proc_stats, raw)))
            ents.append((isp_bwd_opt if fuse_opt else isp_bwd,
                         (state.proc_params, state.proc_stats, raw, rgb0)
                         + proc_tail))
        return ents

    step.cost_entries = cost_entries
    return step


def make_eval_step(cfg: TrainConfig, processor, classifier):
    loss_fn_task = task_loss_fn(cfg)
    aug = get_augmentation(cfg.augmentation)
    aux_fn = (L.aux_loss(cfg.adv_aux_loss, cfg.adv_aux_weight)
              if cfg.adv_training else None)

    def step(state: TrainState, raw, y, key):
        logits, rgb, _, _, _ = _forward(
            cfg, processor, classifier, state.proc_params, state.proc_stats,
            state.clf_params, state.clf_stats, raw, key, train=False)
        y_t = y
        if (cfg.task == "segmentation" and aug is not None
                and cfg.augmentation_on_eval):
            # replay the image's geometric transforms on the mask, as in
            # training (the reference replays in val/test too when
            # augmentation_on_eval, model.py:90)
            y_t = aug(key, y_t, is_mask=True)
        if cfg.task == "segmentation" and logits.shape[-1] == 1:
            logits = logits[..., 0]
        mets = _step_metrics(cfg, logits, y_t)
        loss = loss_fn_task(logits, y_t)
        if aux_fn is not None:
            # val loss includes the adversarial aux regularizer, like the
            # reference's shared update_step (model.py:94-98)
            ref_rgb, _ = processor.apply(
                {"params": state.ref_proc_params,
                 "batch_stats": state.ref_proc_stats},
                raw, train=False)
            loss_aux = aux_fn(ref_rgb, rgb)
            loss = loss + loss_aux
            mets["loss_aux"] = loss_aux
        mets["loss"] = loss
        return logits, mets

    return jax.jit(step)
