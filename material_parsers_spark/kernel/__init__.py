"""Pure deterministic kernels (no Spark, no pandas at the edges).

Each module re-implements one operator family from the reference
(see SURVEY.md §2 for the inventory and file:line citations).
"""
