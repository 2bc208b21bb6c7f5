#!/bin/bash
# Sidecar: sample the SparkSubmit JVM's code cache / metaspace / GC every
# 15 s while a bench runs. Usage: jvm_sampler.sh <outfile>
out="$1"
: > "$out"
for i in $(seq 1 200); do
    pid=$(pgrep -f "org.apache.spark.deploy.SparkSubmit" | head -1)
    if [ -n "$pid" ]; then
        echo "=== $(date +%s) pid=$pid sample=$i" >> "$out"
        jcmd "$pid" Compiler.codecache >> "$out" 2>&1
        jstat -gcutil "$pid" >> "$out" 2>&1
        jcmd "$pid" VM.native_memory 2>/dev/null | grep -A2 "Metaspace\|Class" | head -8 >> "$out" 2>&1
        jcmd "$pid" Compiler.queue 2>/dev/null | grep -c "" | sed 's/^/compile_queue_lines=/' >> "$out" 2>&1
    fi
    sleep 15
done
