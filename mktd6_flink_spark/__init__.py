"""mktd6_flink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of monkeytechdays/mktd6-flink.

The reference is a Flink 1.4 DataStream workshop (stock-market simulation over
Kafka topics). This package re-expresses its entire operator surface
(SURVEY.md §2) Spark-first:

- stateless row ops (map/filter/flatMap)  -> native Column expressions
- routing (split/select/union/connect)    -> tag columns + filters / unionByName
- event-time windows + watermarks         -> window()/withWatermark
- keyed state (EMA, folds, state machines)-> F.aggregate batch folds and
                                             applyInPandasWithState streaming ops
- Kafka topics                             -> readStream/writeStream kafka format
                                             (file "topics" in tests)

plus a first-class large-scale training-data-pipeline layer (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB operation.
"""

__version__ = "0.1.0"
