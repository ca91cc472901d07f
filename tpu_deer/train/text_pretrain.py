"""Masked-token pretraining for the text encoder — the trained replacement
for BERT features.

The reference's text path is a real pretrained BERT with layers 0-5 frozen
(/root/reference/src/models/encoders.py:580,629-646) feeding [CLS] features
into the data pipeline (preprocessing.py:702-729). This image has no BERT
weights (zero egress), so semantics must be LEARNED from the corpus: this
module pretrains the TextSequenceEncoder with BERT's masked-token objective
(15% of tokens, 80% → [MASK] / 10% → random / 10% → kept) over corpus text,
then exposes the pooled encoder output as a drop-in text featurizer behind
the same interface as the hashed baseline (data/features.py).

Why it matters: hashed bag-of-words features cannot generalize across
surface forms — two synonyms hash to unrelated bins. MLM places words that
appear in the same contexts near each other in embedding space, so a linear
probe on pooled features transfers to words never seen with a label
(tests/test_text_pretrain.py demonstrates exactly this against the hashed
baseline).

TPU-first design: token ids are staged device-resident once; the masking is
drawn in-graph from the train step's PRNG key (no host round trip per
batch); the whole step (mask → forward → CE on masked positions → adamw)
is one jitted XLA program.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_deer.data.vocab import CLS_ID, MASK_ID, N_SPECIAL, PAD_ID, SEP_ID, CorpusVocab
from tpu_deer.models.encoders import TextSequenceEncoder


@dataclasses.dataclass(frozen=True)
class TextPretrainConfig:
    model_dim: int = 256
    num_layers: int = 4
    num_heads: int = 8
    output_dim: int = 768  # the model's text feature width (TEXT_DIM)
    dropout: float = 0.1
    mask_prob: float = 0.15
    learning_rate: float = 3e-4
    weight_decay: float = 1e-4
    batch_size: int = 64
    num_epochs: int = 10
    seed: int = 0


def _build_encoder(vocab_size: int, config: TextPretrainConfig) -> TextSequenceEncoder:
    return TextSequenceEncoder(
        vocab_size=vocab_size,
        output_dim=config.output_dim,
        model_dim=config.model_dim,
        num_layers=config.num_layers,
        num_heads=config.num_heads,
        dropout=config.dropout,
    )


def _apply_mlm_mask(rng, token_ids, valid_mask, vocab_size, mask_prob):
    """In-graph BERT masking: returns (corrupted_ids, target_mask).

    Special positions ([CLS]/[SEP]/[PAD]) are never selected. Of selected
    positions: 80% → [MASK], 10% → random non-special id, 10% → unchanged.
    """
    r_select, r_kind, r_rand = jax.random.split(rng, 3)
    maskable = (
        valid_mask.astype(bool)
        & (token_ids != CLS_ID)
        & (token_ids != SEP_ID)
        & (token_ids != PAD_ID)
    )
    selected = (
        jax.random.uniform(r_select, token_ids.shape) < mask_prob
    ) & maskable
    kind = jax.random.uniform(r_kind, token_ids.shape)
    random_ids = jax.random.randint(
        r_rand, token_ids.shape, N_SPECIAL, vocab_size
    )
    corrupted = jnp.where(
        selected & (kind < 0.8),
        MASK_ID,
        jnp.where(selected & (kind >= 0.9), random_ids, token_ids),
    )
    return corrupted, selected


def pretrain_text_encoder(
    texts: Sequence[str],
    vocab: Optional[CorpusVocab] = None,
    config: TextPretrainConfig = TextPretrainConfig(),
    max_vocab: int = 30000,
) -> tuple[dict, CorpusVocab, dict]:
    """MLM-pretrain a TextSequenceEncoder on corpus text.

    Returns (encoder_params, vocab, history). `encoder_params` is the
    full TextSequenceEncoder param tree (MLM logits are tied to the
    embedding, so there is no separate head) — ready to initialize a
    downstream text encoder or the featurizer.
    """
    vocab = vocab or CorpusVocab.build(texts, max_size=max_vocab)
    ids, mask = vocab.encode_batch(texts)

    model = _build_encoder(vocab.vocab_size, config)
    rng = jax.random.PRNGKey(config.seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init(
        init_rng, jnp.asarray(ids[:2]), jnp.asarray(mask[:2]),
        deterministic=True,
    )["params"]

    tx = optax.adamw(config.learning_rate, weight_decay=config.weight_decay)
    opt_state = tx.init(params)

    data = {
        "ids": jax.device_put(ids.astype(np.int32)),
        "mask": jax.device_put(mask.astype(np.int32)),
    }

    def loss_fn(params, batch_ids, batch_mask, step_rng):
        mask_rng, dropout_rng = jax.random.split(step_rng)
        corrupted, targets_mask = _apply_mlm_mask(
            mask_rng, batch_ids, batch_mask, vocab.vocab_size, config.mask_prob
        )
        _, _, _, logits = model.apply(
            {"params": params}, corrupted, batch_mask,
            deterministic=False, rngs={"dropout": dropout_rng},
            mlm_logits=True,
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, batch_ids)
        n = jnp.maximum(targets_mask.sum(), 1)
        loss = jnp.sum(jnp.where(targets_mask, ce, 0.0)) / n
        acc = (
            jnp.sum(
                jnp.where(targets_mask, jnp.argmax(logits, -1) == batch_ids, False)
            )
            / n
        )
        return loss, acc

    @jax.jit
    def train_step(params, opt_state, idx, step_rng):
        batch_ids = jnp.take(data["ids"], idx, axis=0)
        batch_mask = jnp.take(data["mask"], idx, axis=0)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_ids, batch_mask, step_rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    n = len(texts)
    bs = min(config.batch_size, n)
    history = {"mlm_loss": [], "mlm_accuracy": []}
    host_rng = np.random.default_rng(config.seed)
    for epoch in range(config.num_epochs):
        order = host_rng.permutation(n)
        losses, accs = [], []
        for start in range(0, n - bs + 1, bs):
            rng, step_rng = jax.random.split(rng)
            idx = jnp.asarray(order[start : start + bs])
            params, opt_state, loss, acc = train_step(
                params, opt_state, idx, step_rng
            )
            losses.append(loss)
            accs.append(acc)
        losses, accs = jax.device_get((losses, accs))
        history["mlm_loss"].append(float(np.mean(losses)))
        history["mlm_accuracy"].append(float(np.mean(accs)))

    return params, vocab, history


def _encoder_cache_dir(cache_dir, train_texts: Sequence[str]) -> str:
    """Cache dir for a bootstrap-trained encoder, keyed by the training
    corpus (count + content hash) so distinct corpora — quick truncations,
    grown transcripts — never share an entry."""
    import hashlib

    digest = hashlib.sha1(
        "\x1f".join(train_texts).encode("utf-8", "replace")
    ).hexdigest()[:10]
    return os.path.join(
        str(cache_dir), f"text_encoder_{len(train_texts)}_{digest}"
    )


def corpus_text_featurizer(train_texts: Sequence[str], cache_dir) -> "TextEncoderFeaturizer":
    """MLM-pretrain (or load from cache) a text featurizer on a corpus' own
    TRAIN-split transcripts — the automatic bootstrap the loaders run when no
    semantic text backend is configured (no local BERT, no saved encoder
    dir), instead of silently falling back to hashing.

    The epoch budget scales inversely with corpus size so tiny fixtures still
    converge while real corpora stay affordable. The trained featurizer is
    cached next to the feature cache, KEYED BY THE TRAINING CORPUS CONTENT
    (count + text hash): a --quick run truncates the corpus, and its
    undertrained encoder must never be silently reused by a later full run
    (ADVICE r3). Different corpora — or the same corpus with transcripts
    added later — therefore always retrain or hit their own cache entry.
    """
    if not train_texts:
        raise ValueError("text bootstrap requested but the corpus has no train text")
    enc_dir = _encoder_cache_dir(cache_dir, train_texts)
    if os.path.exists(os.path.join(enc_dir, "encoder.msgpack")):
        import logging

        logging.getLogger(__name__).info(
            f"text features: cached MLM encoder from {enc_dir}"
        )
        return TextEncoderFeaturizer.load(enc_dir)
    import logging

    log = logging.getLogger(__name__)
    epochs = int(np.clip(40000 // max(len(train_texts), 1), 5, 60))
    log.info(
        f"text features: MLM-pretraining on {len(train_texts)} transcripts "
        f"({epochs} epochs)…"
    )
    params, vocab, history = pretrain_text_encoder(
        list(train_texts), config=TextPretrainConfig(num_epochs=epochs)
    )
    log.info(
        f"MLM pretraining done: loss {history['mlm_loss'][0]:.3f} → "
        f"{history['mlm_loss'][-1]:.3f}, acc {history['mlm_accuracy'][-1]:.3f}"
    )
    featurizer = TextEncoderFeaturizer(params, vocab)
    featurizer.save(enc_dir)
    return featurizer


class TextEncoderFeaturizer:
    """Drop-in text featurizer backed by a pretrained TextSequenceEncoder.

    Same interface as data.features.TextFeatureExtractor: extract(text) /
    extract_batch(texts) → float32 [model_dim] features. Features are the
    masked MEAN of token-level hidden states — the representation the MLM
    objective actually trains (the pooling head branches off the token
    states and receives no MLM gradient; it is trained later, during
    fine-tuning). This mirrors mean-pooled BERT features. Batched + jitted;
    token ids computed host-side via the corpus vocabulary.
    """

    def __init__(
        self,
        encoder_params: dict,
        vocab: CorpusVocab,
        config: TextPretrainConfig = TextPretrainConfig(),
    ):
        self.vocab = vocab
        self.config = config
        self.encoder = TextSequenceEncoder(
            vocab_size=vocab.vocab_size,
            output_dim=config.output_dim,
            model_dim=config.model_dim,
            num_layers=config.num_layers,
            num_heads=config.num_heads,
            dropout=config.dropout,
        )
        self.params = encoder_params

        @jax.jit
        def _forward(params, ids, mask):
            _, _, seq = self.encoder.apply(
                {"params": params}, ids, mask, deterministic=True,
                return_sequence=True,
            )
            m = mask.astype(seq.dtype)[..., None]
            return (seq * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)

        self._forward = _forward

    def extract_batch(self, texts: Sequence[str]) -> np.ndarray:
        ids, mask = self.vocab.encode_batch(texts)
        out = self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out, dtype=np.float32)

    def extract(self, text: str) -> np.ndarray:
        return self.extract_batch([text])[0]

    # -- persistence --------------------------------------------------------
    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        self.vocab.save(os.path.join(directory, "vocab.json"))
        with open(os.path.join(directory, "encoder.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(self.params))
        import json

        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(self.config), f)

    @classmethod
    def load(cls, directory: str) -> "TextEncoderFeaturizer":
        import json

        vocab = CorpusVocab.load(os.path.join(directory, "vocab.json"))
        with open(os.path.join(directory, "config.json")) as f:
            config = TextPretrainConfig(**json.load(f))
        # Rebuild the param skeleton, then restore bytes into it.
        encoder = TextSequenceEncoder(
            vocab_size=vocab.vocab_size,
            output_dim=config.output_dim,
            model_dim=config.model_dim,
            num_layers=config.num_layers,
            num_heads=config.num_heads,
            dropout=config.dropout,
        )
        skeleton = encoder.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, vocab.max_length), jnp.int32),
            jnp.ones((1, vocab.max_length), jnp.int32),
            deterministic=True,
        )["params"]
        with open(os.path.join(directory, "encoder.msgpack"), "rb") as f:
            params = flax.serialization.from_bytes(skeleton, f.read())
        return cls(params, vocab, config)
