from .webpages import synthesize_pandas, synthesize_corpus, CORPUS_SCHEMA, LABELS_SCHEMA

__all__ = ["synthesize_pandas", "synthesize_corpus", "CORPUS_SCHEMA", "LABELS_SCHEMA"]
