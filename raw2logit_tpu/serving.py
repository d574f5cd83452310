"""Batch inference / serving entry point.

Production path for a trained raw->logit model: load per-component
checkpoints, jit one fused forward (ISP + classifier), stream batches from a
directory or tile store, write predictions. The reference has no serving
path (inference only happens inside the A/B harness, ABtesting.py:207-211);
this is the deployment-facing equivalent.
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


class Predictor:
    """jitted raw -> logits/probs pipeline from checkpoints."""

    def __init__(self, processor, classifier, proc_variables, clf_variables,
                 task="classification", process_fn=None):
        """processor: a flax ISP module (or None), OR pass process_fn — a
        plain callable raw (B,H,W) -> model-ready input (the static-mode
        pipeline + normalization is such a function, not a module)."""
        self.task = task
        self.classes = None  # from_run fills these in
        self.state_dict = None

        def _forward(raw):
            if process_fn is not None:
                rgb = process_fn(raw)
            elif processor is not None:
                rgb, _ = processor.apply(proc_variables, raw, train=False)
            else:
                rgb = raw
            logits = classifier.apply(clf_variables, rgb, train=False)
            if task == "segmentation":
                return jax.nn.sigmoid(logits)
            return logits

        self._forward = jax.jit(_forward)

    @classmethod
    def from_run(cls, experiment_name, run_name, dataset_name="Microscopy",
                 network="resnet18", processing_mode="parametrized",
                 image_size=256, use_pallas=True, root="results/runs",
                 **dataset_kwargs):
        """Build from a training run's checkpoints (tracking layout)."""
        from raw2logit_tpu.data import get_dataset
        from raw2logit_tpu.isp import ParametrizedProcessing
        from raw2logit_tpu.models import UNetPlusPlus, resnet_model
        from raw2logit_tpu.tracking.run import get_model_by_name
        from raw2logit_tpu.training import checkpoint as ckpt

        state_dict, ckpts = get_model_by_name(experiment_name, run_name,
                                              root=root)
        dataset = get_dataset(dataset_name, **dataset_kwargs)
        task = dataset.task

        processor = proc_vars = process_fn = None
        sample_raw = jnp.zeros((1, image_size, image_size), jnp.float32)
        if processing_mode == "parametrized":
            if not ckpts["processor"]:
                raise FileNotFoundError(
                    f"run {experiment_name}/{run_name} has no processor "
                    "checkpoint — was it trained with processing_mode="
                    "'parametrized'? (pass processing_mode='static' to "
                    "serve a static-pipeline run)")
            processor = ParametrizedProcessing(
                camera_parameters=dataset.camera_parameters,
                image_size=image_size, use_pallas=use_pallas)
            init = jax.jit(lambda k: processor.init(k, sample_raw,
                                                    train=False))
            abstract = init(jax.random.key(0))
            proc_vars = ckpt.restore_like(ckpts["processor"], {
                "params": abstract["params"],
                "batch_stats": abstract.get("batch_stats", {})})
        elif processing_mode == "static":
            # rebuild the training-time input pipeline from the run's
            # saved CLI args: static ISP + (x - mean)/std (train.py
            # _StaticAsModule); without this the classifier would see an
            # unprocessed (B,H,W) mosaic
            from raw2logit_tpu.data.datasets import DATASET_STATS
            from raw2logit_tpu.isp import StaticPipeline
            sd = state_dict or {}
            pipe = StaticPipeline(
                camera_parameters=dataset.camera_parameters,
                debayer=sd.get("sp_debayer", "bilinear"),
                sharpening=sd.get("sp_sharpening", "sharpening_filter"),
                denoising=sd.get("sp_denoising", "gaussian_denoising"))
            stats = DATASET_STATS.get(
                dataset_name.replace("Synthetic", ""),
                DATASET_STATS["Microscopy"])
            mean = jnp.asarray(stats["mean"], jnp.float32)
            std = jnp.asarray(stats["std"], jnp.float32)
            process_fn = lambda raw: (pipe(raw) - mean) / std  # noqa: E731

        if task == "classification":
            classifier = resnet_model(
                network, fc_out_features=len(dataset.classes))
        else:
            classifier = UNetPlusPlus(encoder_depth=5,
                                      decoder_channels=(256, 128, 64, 32, 16),
                                      classes=1)
        sample_rgb = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        cinit = jax.jit(lambda k: classifier.init(k, sample_rgb, train=False))
        cabstract = cinit(jax.random.key(1))
        clf_vars = ckpt.restore_like(ckpts["classifier"], {
            "params": cabstract["params"],
            "batch_stats": cabstract.get("batch_stats", {})})

        pred = cls(processor, classifier, proc_vars, clf_vars, task=task,
                   process_fn=process_fn)
        pred.classes = getattr(dataset, "classes", None)
        pred.state_dict = state_dict
        return pred

    def __call__(self, raw_batch):
        """raw (B, H, W) numpy/jnp -> logits (classification) or
        sigmoid masks (segmentation)."""
        return self._forward(jnp.asarray(raw_batch, jnp.float32))

    def predict_dir(self, image_dir, batch_size=32, bits=16,
                    out_path=None):
        """Run every image in a directory; write a predictions JSONL."""
        from raw2logit_tpu.data.datasets import (list_images_in_dir,
                                                 load_image)
        paths = list_images_in_dir(image_dir)
        out_path = out_path or os.path.join("results", "predictions.jsonl")
        if os.path.dirname(out_path):  # bare filename -> cwd
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as fh:
            for i in range(0, len(paths), batch_size):
                chunk = paths[i:i + batch_size]
                raws = np.stack([load_image(p) / (2 ** bits - 1)
                                 for p in chunk])
                out = np.asarray(self(raws))
                for p, o in zip(chunk, out):
                    if self.task == "classification":
                        pred = int(np.argmax(o))
                        rec = {"file": p, "pred": pred,
                               "class": (self.classes[pred]
                                         if self.classes else pred),
                               "logits": [float(x) for x in o]}
                    else:
                        rec = {"file": p,
                               "mask_mean": float(o.mean()),
                               "mask_pixels": int((o > 0.5).sum())}
                    fh.write(json.dumps(rec) + "\n")
        return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description="batch inference")
    p.add_argument("--experiment_name", required=True)
    p.add_argument("--run_name", required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--dataset", default="Microscopy")
    p.add_argument("--network", default="resnet18")
    p.add_argument("--processing_mode", default="parametrized")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    pred = Predictor.from_run(args.experiment_name, args.run_name,
                              dataset_name=args.dataset,
                              network=args.network,
                              processing_mode=args.processing_mode)
    out = pred.predict_dir(args.image_dir, batch_size=args.batch_size,
                           out_path=args.out)
    print(f"predictions -> {out}")


if __name__ == "__main__":
    main()
