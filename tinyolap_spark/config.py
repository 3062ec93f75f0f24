"""Engine configuration & metadata constants.

Parity target: reference ``tinyolap/config.py:1-23`` (``Config`` with
``VERSION`` / ``LOWEST_COMPATIBLE_VERSION`` / ``BUILTIN_VALUE_TYPES`` and
the ``ContentTypes`` tag namespace used by the JSON serializer).  The
content-type tags here are what :mod:`tinyolap_spark.metadata` /
:mod:`tinyolap_spark.database` stamp into persisted JSON, so a reader can
recognize and version-gate each payload section.
"""

from typing import Final


class Config:
    """Configuration and metadata of the tinyolap_spark engine."""

    VERSION: Final = "0.1.0"
    #: oldest persisted-database format this build can still `open()`
    LOWEST_COMPATIBLE_VERSION: Final = "0.1.0"

    #: python value types a cube cell / attribute may legally hold when
    #: round-tripped through the JSON serializer (reference config.py:8-10)
    BUILTIN_VALUE_TYPES: Final = {
        "str": str,
        "int": int,
        "float": float,
        "bool": bool,
        "complex": complex,
        "list": list,
        "tuple": tuple,
        "range": range,
        "dict": dict,
        "set": set,
        "bytes": bytes,
        "bytearray": bytearray,
    }

    class ContentTypes:
        ATTRIBUTE: Final = "TinyOlapSpark.Attribute"
        ATTRIBUTES: Final = "TinyOlapSpark.Attributes"
        DIMENSION: Final = "TinyOlapSpark.Dimension"
        DIMENSIONS: Final = "TinyOlapSpark.Dimensions"
        SUBSET: Final = "TinyOlapSpark.Subset"
        SUBSETS: Final = "TinyOlapSpark.Subsets"
        RULE: Final = "TinyOlapSpark.Rule"
        RULES: Final = "TinyOlapSpark.Rules"
        VIEW: Final = "TinyOlapSpark.View"
        VIEW_DEFINITION: Final = "TinyOlapSpark.ViewDefinition"
        VIEWS: Final = "TinyOlapSpark.Views"
