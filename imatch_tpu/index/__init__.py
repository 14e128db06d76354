from imatch_tpu.index.store import VectorStore

__all__ = ["VectorStore"]
