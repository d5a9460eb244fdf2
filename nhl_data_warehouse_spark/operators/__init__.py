"""Relational + beyond-reference operators.

``staging``/``mart`` re-express the reference's dbt models
(``dags/nhl_dbt/models/example/``) as pure DataFrame transforms.
``dedup``/``similarity``/``text``/``multimodal``/``asof`` are the
beyond-reference operators a 100TB training-data pipeline needs.
"""
