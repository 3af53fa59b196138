#!/bin/sh
# Build the --py-files artifact for cluster submission (north rule:
# "runs via spark-submit --py-files on multi-executor clusters").
#
#   sh scripts/package.sh                 # -> dist/sphinxsearchengine_spark.zip
#   spark-submit --py-files dist/sphinxsearchengine_spark.zip your_driver.py
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/sphinxsearchengine_spark.zip
zip -qr dist/sphinxsearchengine_spark.zip sphinxsearchengine_spark
echo "wrote dist/sphinxsearchengine_spark.zip"
