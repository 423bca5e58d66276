from .linkrank import inlink_counts, pagerank  # noqa: F401
