from sdvg_spark.config.model import (  # noqa: F401
    ColumnSpec,
    ConfigError,
    GenerationConfig,
    ModelSpec,
    OutputConfig,
    ParamsSpec,
    load_config,
    parse_config,
)
