"""Data pipelines: synthetic fixture, dataset parsers, feature extraction, loaders."""

from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
from tpu_deer.data.pipeline import ArrayDataset, BatchIterator
from tpu_deer.data.vocab import CorpusVocab
from tpu_deer.data.raw_corpus import generate_raw_fixture, load_raw_corpus
