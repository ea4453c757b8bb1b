"""Physical-plan helpers: the planner-shaped logic that is NOT data-path
code (SURVEY §4 'custom physical work').

Catalyst owns real planning (pushdown, pruning, join selection, AQE); the
engine's only planner-like decisions are (1) which formulation of the
velocity kernel to build — bucket-tiling when the grid tiles exactly,
range-join otherwise — and (2) CI-checkable plan-shape inspection used by
tests/test_plan_shape.py.
"""

from .chooser import choose_velocity_plan, plan_string

__all__ = ["choose_velocity_plan", "plan_string"]
