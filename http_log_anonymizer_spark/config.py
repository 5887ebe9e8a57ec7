"""Environment-based configuration mirroring the reference's vocabulary.

The reference loads ``__``-separated env names into a typed config
(anonymizer/src/config.rs:178-187; field inventory config.rs:5-51,
145-176). We keep the same env names so a reference ``.envrc`` drives
this engine unchanged. Unknown/absent values fall back to the
reference's defaults (anonymizer/.envrc).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str | None = None) -> str | None:
    return os.environ.get(name, default)


@dataclass(frozen=True)
class KafkaConfig:
    """Mirror of anonymizer/src/config.rs:5-46 (KafkaConfig)."""

    brokers: str = "localhost:9092"
    topic: str = "http_log"
    group_id: str = "anonymizer"
    retries: int = 3
    retry_delay_ms: int = 2000

    @classmethod
    def from_env(cls) -> "KafkaConfig":
        return cls(
            brokers=_env("KAFKA__BROKERS", cls.brokers),
            topic=_env("KAFKA__TOPIC", cls.topic),
            group_id=_env("KAFKA__GROUP_ID", cls.group_id),
            retries=int(_env("KAFKA__RETRIES", str(cls.retries))),
            retry_delay_ms=int(_env("KAFKA__RETRY_DELAY", str(cls.retry_delay_ms))),
        )


@dataclass(frozen=True)
class ClickHouseConfig:
    """Mirror of anonymizer/src/config.rs:48-143 (ChConfig).

    ``rate_limit_s`` maps to the reference's 1-insert-per-window pacing
    (anonymizer/src/limiter.rs:8-43, CH__RATE_LIMIT=65 in .envrc:29);
    in Spark it becomes the micro-batch trigger interval.
    ``max_block_size`` (CH__MAX_BLOCK_SIZE=4096, .envrc:28) becomes
    ``maxOffsetsPerTrigger``.
    """

    url: str = "http://localhost:8124"
    user: str = "default"
    password: str = ""
    database: str = "default"
    table: str = "http_log"
    create_table: bool = True
    max_block_size: int = 4096
    rate_limit_s: int | None = 65
    # reference default when CH__RATE_LIMIT unset: 10 s (sink.rs:264-266)
    default_rate_limit_s: int = 10

    @classmethod
    def from_env(cls) -> "ClickHouseConfig":
        rate = _env("CH__RATE_LIMIT")
        return cls(
            url=_env("CH__URL", cls.url),
            user=_env("CH__USER", cls.user),
            password=_env("CH__PASSWORD", cls.password),
            database=_env("CH__DATABASE", cls.database),
            table=_env("CH__TARGET_TABLE", cls.table),
            create_table=_env("CH__CREATE_TABLE", "true").lower() in ("1", "true", "yes"),
            max_block_size=int(_env("CH__MAX_BLOCK_SIZE", str(cls.max_block_size))),
            rate_limit_s=int(rate) if rate is not None else cls.default_rate_limit_s,
        )


@dataclass(frozen=True)
class EngineConfig:
    """Top-level config (mirror of anonymizer/src/config.rs:145-176)."""

    kafka: KafkaConfig = field(default_factory=KafkaConfig)
    ch: ClickHouseConfig = field(default_factory=ClickHouseConfig)
    num_consumers: int = 2  # NUM_CONSUMERS, .envrc:4 — advisory: Kafka partitions map to Spark tasks
    checkpoint_dir: str = "/tmp/http-log-anonymizer-spark/checkpoints"

    @classmethod
    def from_env(cls) -> "EngineConfig":
        return cls(
            kafka=KafkaConfig.from_env(),
            ch=ClickHouseConfig.from_env(),
            num_consumers=int(_env("NUM_CONSUMERS", "2")),
            checkpoint_dir=_env(
                "SPARK_CHECKPOINT_DIR", "/tmp/http-log-anonymizer-spark/checkpoints"
            ),
        )
