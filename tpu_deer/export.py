"""Ahead-of-time model export: serialized StableHLO serving artifacts.

The reference has no deployment story at all (inference is "call the torch
module from Python", run_multimodal_deer.py:695-734). Here the flagship
model exports to a self-contained artifact directory:

  * one serialized `jax.export` executable per serving batch bucket —
    StableHLO with shape/dtype calling conventions baked in, loadable and
    runnable WITHOUT the model's Python code (only jax + the artifact);
  * params saved as a flat .npz (no pickle — same policy as data/cache.py);
  * a JSON manifest with the model config, buckets, and target platforms.

Multi-platform lowering (`platforms=("cpu", "tpu")`) produces one artifact
that runs on dev CPUs and serving TPUs alike. `load_exported` returns an
engine with the same bucketed-padding `predict` contract as
serve.InferenceEngine, so callers can swap between live-jit and AOT paths.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from tpu_deer.models.deer_model import CompleteDEERModel, DEERModelConfig

MANIFEST = "manifest.json"
PARAMS_FILE = "params.npz"

# Outputs of the exported forward, in calling-convention order (the
# serialized executable returns a tuple; names are restored from here).
OUTPUT_NAMES = (
    "mu", "uncertainty", "calibrated_uncertainty", "expected_abs_error"
)


def _flatten_params(params) -> dict[str, np.ndarray]:
    # One device_get for the whole tree (per-leaf fetches would pay the
    # remote-tunnel round trip ~150 times — CLAUDE.md discipline).
    params = jax.device_get(params)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(getattr(k, "key", str(k)) for k in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_params(flat: dict[str, np.ndarray]):
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def export_inference(
    model: CompleteDEERModel,
    params,
    output_dir: str,
    batch_buckets: Sequence[int] = (1, 8, 64, 256),
    platforms: Optional[Sequence[str]] = None,
    quantize: bool = False,
    ensemble: bool = False,
    ood_detector=None,
    ood_fpr: float = 0.01,
    serving_channel: str = "eabs",
) -> dict:
    """Export the deterministic forward for each batch bucket.

    `serving_channel` ("calibrated" | "eabs") records in the manifest which
    uncertainty channel deployment should read — pass the trainer's
    checkpoint-time selection (the CLI's export mode does this from the
    checkpoint metadata). The exported program always emits both channels.

    Returns the manifest dict. `platforms=None` lowers for the current
    backend only; pass e.g. ("cpu", "tpu") for a portable artifact.

    `quantize=True` bakes the int8 serving path into the artifact: the
    params payload is per-channel int8 kernels + scales (~4x smaller on
    disk AND in serving HBM) and the dequantize is part of the exported
    StableHLO, fused into each matmul by the serving-side compiler.

    `ensemble=True` exports a stacked K-member tree (train/ensemble.py):
    the member forwards vmap inside the exported program and the outputs
    are the moment-matched combination — combined uncertainty =
    mean(member uncertainty) + var(member mu), identical to what
    EnsembleTrainer evaluates — so the artifact keeps the standard
    OUTPUT_NAMES calling convention.

    `ood_detector` (a fitted eval/ood.py:MahalanobisOOD in "input_norm"
    space) bakes the OOD guardrail into the artifact: the exported program
    gains an `ood_score` output computed from the per-modality-normalized
    inputs — the detector's mean/whitener become StableHLO constants, so
    the artifact stays loadable without any tpu_deer code — and the
    manifest records the `ood_fpr` training-quantile threshold that
    ExportedEngine uses to emit `is_ood`. Fused-space detectors are
    rejected: their features depend on the member tree (ensembles) and the
    input_norm space is the measured-stronger guardrail anyway
    (experiments/RESULTS_ood.md).
    """
    if ood_detector is not None and ood_detector.space != "input_norm":
        raise ValueError(
            "export supports 'input_norm'-space OOD detectors only; got "
            f"space={ood_detector.space!r} (fused-space detectors are for "
            "representation monitoring, not exported serving)"
        )
    if serving_channel not in ("calibrated", "eabs"):
        raise ValueError(
            f"serving_channel must be 'calibrated' or 'eabs', "
            f"got {serving_channel!r}"
        )
    os.makedirs(output_dir, exist_ok=True)
    cfg = model.config

    def base(params, audio, video, text):
        from tpu_deer.core.nig import nig_expected_abs_error

        out = model.apply(
            {"params": params}, audio, video, text, deterministic=True
        )
        eabs = jnp.concatenate(
            [
                nig_expected_abs_error(out[f"{n}_params"])
                for n in cfg.dim_names
            ],
            axis=-1,
        )
        return (
            out["mu_all"], out["uncertainty_all"],
            out["calibrated_uncertainty"], eabs,
        )

    if ensemble:

        def combined(params, audio, video, text):
            m_mu, m_unc, m_cal, m_eabs = jax.vmap(
                lambda p: base(p, audio, video, text)
            )(params)
            disagreement = jnp.var(m_mu, axis=0)
            return (
                jnp.mean(m_mu, axis=0),
                jnp.mean(m_unc, axis=0) + disagreement,
                jnp.mean(m_cal, axis=0) + disagreement,
                # Variance-space combination (MADs don't add linearly) —
                # same formula as serve.py / train/ensemble.py.
                jnp.sqrt(
                    jnp.mean(m_eabs, axis=0) ** 2
                    + 2.0 / jnp.pi * disagreement
                ),
            )

    else:
        combined = base

    if quantize:
        from tpu_deer.ops.quantization import (
            dequantize_tree_device,
            quantize_tree,
        )

        def forward(qs, audio, video, text):
            return combined(dequantize_tree_device(*qs), audio, video, text)

    else:
        forward = combined

    if ood_detector is not None:
        from tpu_deer.eval.ood import (
            input_norm_features_device,
            mahalanobis_score_device,
        )

        ood_mean, ood_whitener = ood_detector.device_arrays
        inner = forward

        def forward(ps, audio, video, text):
            return inner(ps, audio, video, text) + (
                mahalanobis_score_device(
                    input_norm_features_device(audio, video, text),
                    ood_mean, ood_whitener,
                ),
            )

    jitted = jax.jit(forward)
    exporter = jax_export.export(
        jitted, platforms=list(platforms) if platforms else None
    )

    if quantize:
        q_tree, s_tree = quantize_tree(
            jax.device_get(params), member_stacked=ensemble
        )
        flat = {
            **{f"q/{k}": v for k, v in _flatten_params(q_tree).items()},
            **{f"scale/{k}": v for k, v in _flatten_params(s_tree).items()},
        }
        param_tree = (
            _unflatten_params(_flatten_params(q_tree)),
            _unflatten_params(_flatten_params(s_tree)),
        )
    else:
        flat = _flatten_params(params)
        param_tree = _unflatten_params(flat)  # host-numpy tree, abstractable
    # Abstract shapes only — no device arrays are materialized for tracing
    # (jnp ops on ~150 host leaves would each be a tunnel round trip).
    abstract_params = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        param_tree,
    )
    artifacts = {}
    for b in sorted(batch_buckets):
        exported = exporter(
            abstract_params,
            jax.ShapeDtypeStruct((b, cfg.audio_dim), np.float32),
            jax.ShapeDtypeStruct((b, cfg.video_dim), np.float32),
            jax.ShapeDtypeStruct((b, cfg.text_dim), np.float32),
        )
        name = f"forward_b{b}.hlo"
        with open(os.path.join(output_dir, name), "wb") as f:
            f.write(exported.serialize())
        artifacts[str(b)] = name

    np.savez(os.path.join(output_dir, PARAMS_FILE), **flat)
    manifest = {
        "format": "tpu_deer.export.v1",
        "model": "CompleteDEERModel",
        "config": {
            "audio_dim": cfg.audio_dim,
            "video_dim": cfg.video_dim,
            "text_dim": cfg.text_dim,
        },
        "outputs": list(OUTPUT_NAMES)
        + (["ood_score"] if ood_detector is not None else []),
        "buckets": sorted(int(b) for b in batch_buckets),
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "artifacts": artifacts,
        "quantized": bool(quantize),
        "serving_channel": serving_channel,
        "ensemble_members": (
            int(jax.tree_util.tree_leaves(param_tree)[0].shape[0])
            if ensemble else 1
        ),
        "n_params": int(
            sum(v.size for k, v in flat.items() if not k.startswith("scale/"))
        ),
    }
    if ood_detector is not None:
        manifest["ood"] = {
            "space": ood_detector.space,
            "fpr": float(ood_fpr),
            "threshold": float(ood_detector.threshold(ood_fpr)),
        }
    with open(os.path.join(output_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedEngine:
    """Serving engine over a deserialized AOT artifact (no model code).

    Same predict contract as serve.InferenceEngine: bucketed padding,
    chunking past the largest bucket, numpy in/out.
    """

    def __init__(self, output_dir: str):
        with open(os.path.join(output_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format") != "tpu_deer.export.v1":
            raise ValueError(
                f"unrecognized export format in {output_dir}: "
                f"{self.manifest.get('format')!r}"
            )
        flat = dict(np.load(os.path.join(output_dir, PARAMS_FILE)))
        tree = _unflatten_params(flat)
        self.params = (
            (tree["q"], tree["scale"])
            if self.manifest.get("quantized")
            else tree
        )
        self.buckets = self.manifest["buckets"]
        # Channel deployment should read, as recorded at export time
        # (pre-selection artifacts default to the training-free channel).
        self.serving_channel = self.manifest.get("serving_channel", "eabs")
        self._fns = {}
        for b, name in self.manifest["artifacts"].items():
            with open(os.path.join(output_dir, name), "rb") as f:
                self._fns[int(b)] = jax_export.deserialize(f.read())

    def predict(
        self, audio: np.ndarray, video: np.ndarray, text: np.ndarray
    ) -> dict[str, np.ndarray]:
        from tpu_deer.serve import bucketed_predict

        names = self.manifest["outputs"]

        def run(a, v, t):
            out = self._fns[len(a)].call(
                self.params,
                jnp.asarray(a, jnp.float32),
                jnp.asarray(v, jnp.float32),
                jnp.asarray(t, jnp.float32),
            )
            return dict(zip(names, out))

        res = bucketed_predict(run, self.buckets, audio, video, text)
        ood = self.manifest.get("ood")
        if ood is not None:
            res["is_ood"] = res["ood_score"] > ood["threshold"]
        return res


def load_exported(output_dir: str) -> ExportedEngine:
    return ExportedEngine(output_dir)
