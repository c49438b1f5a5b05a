from .analysis_a import lifetime_view_rate_curve  # noqa: F401
from .analysis_b import initial_rate_by_posting_hour, pushes_per_time_bin  # noqa: F401
from .analysis_c import views_gained_by_city  # noqa: F401
