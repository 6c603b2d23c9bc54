"""Relational + LLM-pipeline operators (SURVEY.md §2.2-§2.10).

Each module registers its queries via ``registry.register`` at import time;
``registry.load_all()`` imports everything.
"""
