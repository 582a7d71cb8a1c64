"""The zero-shot inference engine — the framework's benchmark hot path.

Reference pipeline (25 img/s on an A5000): per-batch python loop, fp32
ResNet → project → normalize, one BERT call *per disease* for text features,
torch matmul, per-sample python threshold loops
(0425/zero_shot_predict.py:13-147, disease_analysis.py:291-364).

TPU-native redesign:
- Text features for ALL diseases' prompt banks batch into a single BERT
  forward (flattened prompts + segment-mean back to [C, D]), computed once
  and cached — not once per batch/epoch.
- The per-image path is ONE jitted XLA program: uint8 batch → fused
  resize+normalize (MXU matmuls) → bf16 image tower → projection →
  L2-normalize+similarity (Pallas kernel on TPU) → sigmoid/softmax probs.
- Host does only the final prediction-set extraction (predict.py).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ZeroShotConfig
from ..ops.image_prep import preprocess_images
from ..ops.similarity import l2_normalize, similarity
from .predict import sigmoid_predictions, softmax_topk_predictions


def encode_prompt_bank(
    prompts: Dict[str, List[str]],
    disease_list: Sequence[str],
    encode_fn,
    tokenizer,
    max_length: int = 512,
    batch_size: int = 64,
) -> jnp.ndarray:
    """disease → prompt list ⇒ [C, D] text feature matrix.

    Flattens every prompt into one tokenized batch, runs the text tower in
    fixed-size chunks (one compile), L2-normalizes per prompt, then means
    within each disease's segment (the reference's normalize-then-mean order,
    0425/disease_analysis.py:227-240).
    """
    flat: List[str] = []
    segments: List[int] = []
    for c, d in enumerate(disease_list):
        plist = prompts.get(d) or [f"This is a chest X-ray showing {d}."]
        flat.extend(plist)
        segments.extend([c] * len(plist))
    seg = np.asarray(segments)

    feats = []
    for start in range(0, len(flat), batch_size):
        chunk = flat[start : start + batch_size]
        if len(chunk) < batch_size:
            chunk = chunk + [""] * (batch_size - len(chunk))  # pad compile shape
        enc = tokenizer.encode(chunk, max_length=max_length)
        out = encode_fn(
            jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"])
        )
        feats.append(np.asarray(out, np.float32))
    all_feats = np.concatenate(feats)[: len(flat)]
    all_feats = np.asarray(l2_normalize(jnp.asarray(all_feats)))

    c = len(disease_list)
    sums = np.zeros((c, all_feats.shape[1]), np.float32)
    np.add.at(sums, seg, all_feats)
    counts = np.bincount(seg, minlength=c).astype(np.float32)[:, None]
    return jnp.asarray(sums / np.maximum(counts, 1.0))


class ZeroShotEngine:
    """Batched zero-shot prediction over a fixed text-feature bank."""

    def __init__(
        self,
        model,
        variables,
        tokenizer,
        disease_list: Sequence[str],
        config: Optional[ZeroShotConfig] = None,
        mean: Tuple[float, ...] = (0.0, 0.0, 0.0),
        std: Tuple[float, ...] = (1.0, 1.0, 1.0),
        image_size: int = 224,
        max_text_length: int = 512,
        compute_dtype=jnp.bfloat16,
        use_enhance: bool = False,
        mesh=None,
    ):
        """`mesh`: an optional device mesh. 1-D: image batches shard across
        the data axis, params replicated (pure DP, ICI-local). 2-D
        ``(data, model)``: additionally the transformer towers' weights are
        tensor-parallel over the ``model`` axis (parallel/tp.py rules) —
        the serving-latency regime where per-chip tower time, not batch
        throughput, is the budget."""
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
            self._batch_shards = int(mesh.shape[mesh.axis_names[0]])
            if len(mesh.axis_names) > 1:
                from ..parallel.tp import shard_state_tp

                variables = shard_state_tp(
                    variables, mesh, axis_name=mesh.axis_names[1]
                )
            else:
                variables = jax.device_put(variables, NamedSharding(mesh, P()))
        else:
            self._batch_sharding = None
            self._batch_shards = 1
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.disease_list = list(disease_list)
        self.config = config or ZeroShotConfig()
        self.mean, self.std = tuple(mean), tuple(std)
        self.image_size = image_size
        self.max_text_length = max_text_length
        self.compute_dtype = compute_dtype
        self.use_enhance = use_enhance
        self.text_features: Optional[jnp.ndarray] = None

        @jax.jit
        def _encode_text(variables, ids, mask):
            return self.model.apply(
                variables, ids, mask, normalize=True, method="encode_text"
            )

        self._encode_text = _encode_text

        @functools.partial(jax.jit, static_argnames=("temperature",))
        def _probs(variables, images_u8, text_features, temperature):
            x = preprocess_images(
                images_u8, self.image_size, self.image_size,
                self.mean, self.std, out_dtype=self.compute_dtype,
            )
            feats = self.model.apply(
                variables, x, normalize=True, method="encode_image"
            )
            if self.use_enhance:
                feats, _ = self.model.apply(
                    variables, feats, text_features, method="enhance"
                )
                feats = l2_normalize(feats)
            logits = similarity(
                feats.astype(jnp.float32),
                text_features.astype(jnp.float32),
                temperature,
            )
            return logits

        self._logits = _probs

    # -- text ---------------------------------------------------------------

    def build_text_features(self, prompts: Dict[str, List[str]]) -> jnp.ndarray:
        self.text_features = encode_prompt_bank(
            prompts,
            self.disease_list,
            lambda ids, mask: self._encode_text(self.variables, ids, mask),
            self.tokenizer,
            self.max_text_length,
        )
        return self.text_features

    # -- images -------------------------------------------------------------

    def _dispatch(self, images_u8):
        imgs = jnp.asarray(images_u8)
        if imgs.ndim == 5:
            imgs = imgs.reshape((-1, *imgs.shape[2:]))
        n_real = imgs.shape[0]
        if self._batch_sharding is not None:
            pad = (-n_real) % self._batch_shards
            if pad:  # pad rows so the batch shards evenly; sliced off below
                imgs = jnp.concatenate(
                    [imgs, jnp.zeros((pad, *imgs.shape[1:]), imgs.dtype)]
                )
            imgs = jax.device_put(imgs, self._batch_sharding)
        out = self._logits(
            self.variables, imgs, self.text_features, self.config.temperature
        )
        return out, n_real

    def logits(self, images_u8) -> np.ndarray:
        """[B, H, W, 3] uint8 (or [B, V, H, W, 3], flattened) → [B, C]."""
        assert self.text_features is not None, "call build_text_features first"
        out, n_real = self._dispatch(images_u8)
        return np.asarray(out)[:n_real]

    def probs(self, images_u8) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-self.logits(images_u8)))

    def stream_logits(self, batches):
        """Double-buffered evaluation: dispatch batch N+1 to the device
        before fetching batch N's logits, so H2D/compute/D2H overlap.
        Yields (batch, logits[np]) pairs in order."""
        assert self.text_features is not None, "call build_text_features first"
        pending = None
        for batch in batches:
            handle, n_real = self._dispatch(batch["images"])
            if pending is not None:
                prev_batch, prev_handle, prev_n = pending
                yield prev_batch, np.asarray(prev_handle)[:prev_n]
            pending = (batch, handle, n_real)
        if pending is not None:
            prev_batch, prev_handle, prev_n = pending
            yield prev_batch, np.asarray(prev_handle)[:prev_n]

    def predict(
        self, images_u8, threshold=None, top_k: Optional[int] = None
    ) -> Tuple[List[List[str]], List[List[float]]]:
        """Reference-semantics prediction sets."""
        if self.config.predictor == "softmax_topk":
            return softmax_topk_predictions(
                self.logits(images_u8), self.disease_list,
                top_k or self.config.top_k,
            )
        return sigmoid_predictions(
            self.probs(images_u8),
            self.disease_list,
            self.config.threshold if threshold is None else threshold,
            top_k,
        )
