#!/usr/bin/env python3
"""Build an ADVERSARIAL documents fixture from a driver testdata dir:
copies every table as-is, appends non-ASCII (CJK/Cyrillic/accented)
rows, and nulls out a few text/lang values — so the full Verify +
check.py gate proves the oracles are byte-correct (no byte==char
shortcut) AND null-convergent (Spark's non-ANSI size(split(NULL))=-1
family of traps) on data the generated corpus never exercises.

Usage: python3 tools/make_cjk_fixture.py SRC_SF_DIR OUT_DIR
"""
import shutil
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# BMP-only on purpose: engines agree on code-point semantics there;
# non-BMP (emoji) split('') behavior differs (UTF-16 units vs code
# points) and is a documented tokenization caveat, not a media one.
CJK_TEXTS = [
    # Chinese product labels match the upstream reference's own data
    # domain (AreaTop3ProductSpark product_status values).
    "自营商品 与 第三方商品 在 区域 热门 商品 统计 中 的 区分 方式",
    "火锅 蛋糕 重庆辣子鸡 国贸大厦 太古商场 日本料理 温泉",
    "用户 行为 分析 系统 包括 会话 统计 页面 转化 以及 广告 点击 流",
    "データ 分析 エンジン の 性能 測定 と 結果 検証 の ため の 長い テキスト",
    "日本語 テキスト 処理 形態素 解析 と 分散 処理 の 組み合わせ",
    "한국어 텍스트 품질 점수 측정 테스트 구간 경계 확인 데이터",
    "분산 처리 엔진 의 셔플 파티션 과 브로드캐스트 조인 최적화",
    "Привет мир это длинный тест кодировки текста для проверки байтов",
    "Распределённый движок аналитики пользовательского поведения",
    "Größe straße über café naïve déjà vu Ω ω αβγ δεζ ηθι",
    "mixed ascii and 中文 tokens in one 文档 with spaces between 词语",
    "el niño mañana señor jalapeño piñata año España französisch",
]


def main(src: str, out: str) -> None:
    shutil.copytree(src, out, dirs_exist_ok=True)
    docs = pq.read_table(f"{src}/documents.parquet").to_pandas()
    next_id = int(docs.doc_id.max()) + 1
    langs = ["zh", "zh", "zh", "ja", "ja", "ko", "ko", "ru", "ru", "de",
             "zh", "es"]
    rows = []
    for i, base in enumerate(CJK_TEXTS):
        # repeat some texts so a few exceed several 64-byte frames and
        # the min-token gates (q47/q64) see multilingual docs too
        text = (base + " ") * (1 + (i % 3) * 8)
        text = text.strip()
        rows.append({
            "doc_id": next_id + i,
            "text": text,
            "lang": langs[i],
            "source": f"src{i % 10}",
            "n_chars": len(text),
        })
    aug = pd.concat([docs, pd.DataFrame(rows)], ignore_index=True)
    # null injection: corrupt corpora have null texts/langs and the
    # generated fixture has none — latent cross-engine null-handling
    # divergence (DuckDB NULL vs Spark non-ANSI -1/'' results) only
    # shows up here
    aug.loc[aug.index % 97 == 5, "text"] = None
    aug.loc[aug.index % 89 == 7, "lang"] = None
    aug.loc[aug.text.isna(), "n_chars"] = 0
    schema = pq.read_table(f"{src}/documents.parquet").schema
    pq.write_table(
        pa.Table.from_pandas(aug, schema=pa.schema(
            [schema.field(i) for i in range(len(schema.names))]),
            preserve_index=False),
        f"{out}/documents.parquet")
    n_multi = sum(1 for r in rows
                  if r["text"] and len(r["text"].encode()) > len(r["text"]))
    print(f"wrote {out}/documents.parquet: {len(aug)} rows "
          f"({len(rows)} appended, {n_multi} with bytes>chars, "
          f"{int(aug.text.isna().sum())} null texts, "
          f"{int(aug.lang.isna().sum())} null langs)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
