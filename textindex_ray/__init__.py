"""textindex_ray — a Ray-Data-native inverted-index build + BM25 query engine.

Brand-new implementation of the query/data-processing capabilities of the
reference ``thscharler/textindex`` (see SURVEY.md), architected for Ray
Data: streaming Dataset pipelines of Arrow batches, actor pools for the
stateful extract/tokenize stages, groupby/sort shuffles for posting-list
construction, segment-granular checkpointing for resume.
"""

__version__ = "0.1.0"
