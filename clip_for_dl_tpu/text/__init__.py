from .tokenizer import (
    BasicTokenizer,
    BertTokenizer,
    WordPieceTokenizer,
    build_tiny_vocab,
    load_vocab,
)

__all__ = [
    "BasicTokenizer",
    "BertTokenizer",
    "WordPieceTokenizer",
    "build_tiny_vocab",
    "load_vocab",
]
