"""Convenience loader factory — API parity with reference
create_enhanced_dataloaders (preprocessing.py:741-787).

The reference returns torch DataLoaders (and its CLI calls it with the wrong
signature, so the path never actually ran — SURVEY.md §2.9.3). Here the
equivalent returns (datasets, iterators): ArrayDatasets plus seeded
BatchIterators per split, ready for DEERTrainer.
"""

from __future__ import annotations

from tpu_deer.data.pipeline import ArrayDataset, BatchIterator


def create_enhanced_dataloaders(
    root_path: str,
    batch_size: int = 32,
    dataset: str = "iemocap",
    quick: bool = False,
    seed: int = 0,
    extractor=None,
) -> tuple[dict[str, ArrayDataset], dict[str, BatchIterator]]:
    """Parse + featurize a dataset root → ({split: ds}, {split: iterator})."""
    from tpu_deer.data import iemocap, meld, ravdess

    loaders = {
        "iemocap": iemocap.load_iemocap,
        "ravdess": ravdess.load_ravdess,
        "meld": meld.load_meld,
    }
    if dataset.lower() not in loaders:
        raise ValueError(f"unknown dataset {dataset!r}; expected {list(loaders)}")
    datasets = loaders[dataset.lower()](root_path, quick=quick, extractor=extractor)
    # Loaders also return a "text_backend" provenance string — keep only the
    # split datasets for the iterator map.
    datasets = {
        split: ds for split, ds in datasets.items()
        if isinstance(ds, ArrayDataset)
    }
    iterators = {
        split: BatchIterator(
            ds,
            batch_size,
            shuffle=(split == "train"),
            drop_last=(split == "train"),
            seed=seed,
        )
        for split, ds in datasets.items()
    }
    return datasets, iterators
