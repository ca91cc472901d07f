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
    # datasets.pretrain_text: MLM-pretrain the text featurizer on corpus
    # transcripts when no BERT/saved encoder is available (IEMOCAP only —
    # it is the corpus with real transcripts).
    pretrain_text = bool(config.get("datasets", {}).get("pretrain_text", False))
    out = {"train": {}, "val": {}, "test": {}}
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
            if name.upper() == "IEMOCAP" and pretrain_text:
                kwargs["pretrain_text"] = True
            splits = loader(path, **kwargs)
        except Exception as e:
            logger.warning(f"failed to load {name} from {path}: {e}")
            continue
        for split in ("train", "val", "test"):
            if split in splits and len(splits[split]) > 0:
                out[split][name.lower()] = splits[split]
        found = True
    return out if found else None
