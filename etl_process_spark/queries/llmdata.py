"""Training-data pipeline queries (dedup, similarity, text analysis, JSON).

Registered incrementally; see SURVEY §7 step 8.
"""

from __future__ import annotations
