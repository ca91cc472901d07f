"""Dataset registry: map config dataset names/paths to loaded ArrayDatasets.

Bridges the YAML config (`datasets.names` / `datasets.paths`) to the parser
modules (iemocap/ravdess/meld). Returns None when no configured path exists
on disk, which triggers the caller's loud synthetic fallback.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def load_configured_datasets(config: dict, quick: bool = False) -> Optional[dict]:
    """Load every configured dataset that exists on disk.

    Returns {"train": {name: ArrayDataset}, "val": {...}, "test": {...}} or
    None if nothing is available.
    """
    try:
        from tpu_deer.data import iemocap, meld, ravdess
    except ImportError as e:  # parsers unavailable in this build
        logger.warning(f"dataset parsers unavailable: {e}")
        return None

    loaders = {
        "IEMOCAP": iemocap.load_iemocap,
        "RAVDESS": ravdess.load_ravdess,
        "MELD": meld.load_meld,
    }

    names = config.get("datasets", {}).get("names", [])
    paths = config.get("datasets", {}).get("paths", {})
    # datasets.pretrain_text: None/absent = AUTO — when corpus transcripts
    # exist and no semantic text backend is configured (no $TPU_DEER_BERT_DIR,
    # no saved encoder dir), MLM-pretrain the text featurizer on the corpus'
    # own train-split text instead of silently hashing. Explicit false forces
    # the hashed fallback; explicit true forces pretraining.
    pretrain_text = config.get("datasets", {}).get("pretrain_text", None)
    if pretrain_text is not None:
        pretrain_text = bool(pretrain_text)
    out = {"train": {}, "val": {}, "test": {}}
    text_backends: dict[str, str] = {}
    found = False
    for name in names:
        path = paths.get(name)
        if not path or not os.path.isdir(path):
            continue
        loader = loaders.get(name.upper())
        if loader is None:
            logger.warning(f"unknown dataset {name!r} — skipping")
            continue
        try:
            kwargs = {"quick": quick}
            if name.upper() in ("IEMOCAP", "MELD"):
                kwargs["pretrain_text"] = pretrain_text
            splits = loader(path, **kwargs)
        except Exception as e:
            logger.warning(f"failed to load {name} from {path}: {e}")
            continue
        for split in ("train", "val", "test"):
            if split in splits and len(splits[split]) > 0:
                out[split][name.lower()] = splits[split]
        text_backends[name.lower()] = str(splits.get("text_backend", "hashed"))
        found = True
    if not found:
        return None
    out["meta"] = {"text_backend": text_backends}
    logger.info(f"text feature backends: {text_backends}")
    return out
