"""Training-data pipeline suite: dedup, similarity, text analysis,
multimodal (SURVEY.md §7.2 step 7). Populated by the corresponding
operators in ``operators/dedup.py`` / ``operators/similarity.py`` /
``operators/text.py`` / ``operators/multimodal.py``.
"""

from __future__ import annotations
