from .jsonl import ShardedJsonlDataset, split_shard
from .masking import TextMaskingGenerator
from .tokenizer import build_tokenizer
