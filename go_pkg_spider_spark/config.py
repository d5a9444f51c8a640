"""Job configuration — the functional-options pattern of the reference
(X3, /root/reference/spider_news.go:45, 77-99) as a frozen dataclass.

Every knob that was a hard-coded constant in the reference is surfaced
here with the reference value as default, so a user of NewsSpider's
Option list finds the same dials."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # guards (reference values)
    min_chars: int = 64            # BodyMinSize, lang.go:21
    max_chars: int = 1_000_000
    body_chunk_size: int = 2048    # BodyChunkSize, lang.go:20
    max_content_length: int = 10 * 1024 * 1024  # detect.go:110

    # classification thresholds (lang.go / link.go / content.go)
    han_rate: float = 0.3
    ja_in_han_rate: float = 0.1
    english_rate: float = 0.618
    latin_count: int = 5
    title_ja_ko_rate: float = 0.2
    publish_prob_threshold: float = 0.7
    top_path_prob: float = 0.4
    top_path_min_content: int = 8
    title_sim_zh: float = 0.3      # TitleSimZh, content.go:71
    title_sim_word: float = 0.5    # content.go:73

    # determinism
    run_date: str = "2024-10-08"   # injected (never current_date)

    # scale knobs
    num_buckets: int = 64          # manifest partition batches
    salt_buckets: int = 8
    shuffle_partitions: int | None = None

    # retry/resume (S5: task retries + idempotent manifest)
    max_task_failures: int = 4

    codec_whitelist: tuple[str, ...] = ("wav", "pcm_s16le", "flac")

    extra_spark_conf: dict[str, str] = field(default_factory=dict)
