from .hashing import md5_int, minhash_permutation_cols, shingle_chars, token_array

__all__ = [
    "md5_int",
    "shingle_chars",
    "token_array",
    "minhash_permutation_cols",
]
