"""Operator library: relational extensions + LLM-data-pipeline operators.

Every operator here is expressed DataFrame-first so Catalyst handles
pushdown, pruning, join strategy and AQE re-planning; Python (pandas UDF)
appears only where built-in expressions genuinely cannot express the
semantics (see SURVEY.md §2.11).
"""
