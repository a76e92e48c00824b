from textindex_ray.sources.files import read_file_corpus  # noqa: F401
