"""Auxiliary runtime subsystems: metrics and checkpoint/resume.

SURVEY.md §5 equivalents of the reference's ad-hoc facilities: structured
(JSON-lines) + human metrics with the same duality as the reference's
``papr -g`` / ``xport -s`` conventions, and stream-state checkpointing (the
chains' carry state is a small pytree, so long streams resume mid-file).
"""
