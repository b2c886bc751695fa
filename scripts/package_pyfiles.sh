#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/crawler_news_spark.zip
zip -qr dist/crawler_news_spark.zip crawler_news_spark -x '*__pycache__*'
echo "dist/crawler_news_spark.zip"
