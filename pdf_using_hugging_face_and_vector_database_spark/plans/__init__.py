"""Physical-plan inspection: the 100 TB sanity harness."""

from .explain import (  # noqa: F401
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    has_take_ordered,
    scan_read_schema,
)
