"""Pure numpy/pandas kernels: codecs, norms, BM25 math, tokenizers."""
