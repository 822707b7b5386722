from .vocab import (
    SPECIAL,
    ZINC_SPECIAL_TOKENS,
    build_vocab_from_texts,
    build_fixed_zinc_vocab,
    extend_vocab_with_dynamic_tokens,
    collect_dynamic_tokens,
    get_atom_type_id,
    get_bond_type_id,
)
from .ibtt import (
    tokenize_zinc_molecule,
    zinc_label_token,
    encode_text,
    encode_texts,
    strip_label_tokens,
)
from .sent import TrailTokenizer, SOS, RESET, LADJ, RADJ, EOS, PAD
from .pack import pad_sequences, pack_corpus

__all__ = [
    "SPECIAL", "ZINC_SPECIAL_TOKENS",
    "build_vocab_from_texts", "build_fixed_zinc_vocab",
    "extend_vocab_with_dynamic_tokens", "collect_dynamic_tokens",
    "get_atom_type_id", "get_bond_type_id",
    "tokenize_zinc_molecule", "zinc_label_token",
    "encode_text", "encode_texts", "strip_label_tokens",
    "TrailTokenizer", "SOS", "RESET", "LADJ", "RADJ", "EOS", "PAD",
    "pad_sequences", "pack_corpus",
]
