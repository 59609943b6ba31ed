from securities_pricing_data_pipeline_spark.functions.datetime import (  # noqa: F401
    date_sk,
    day_name_abbrev,
    day_of_week_0sun,
    is_weekend,
    month_name_abbrev,
    week_of_year_iso,
)
from securities_pricing_data_pipeline_spark.functions.normalize import (  # noqa: F401
    normalize_symbol,
    null_if,
)
from securities_pricing_data_pipeline_spark.functions.finance import (  # noqa: F401
    daily_return,
    traded_value,
)
