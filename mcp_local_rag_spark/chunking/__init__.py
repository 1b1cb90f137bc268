from .splitter import split_sentences, split_sentences_udf  # noqa: F401
from .maxmin import maxmin_chunk  # noqa: F401
