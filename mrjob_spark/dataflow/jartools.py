"""Build small jars at test/query time — support surface for X7 jar steps.

The container ships a full JDK (javac/jar alongside java), so the X7 demo
jar is compiled on first use and cached by source hash. Environments with
a bare JRE get a clear gate error up front instead of a subprocess
failure mid-chain (same policy as the protobuf / multimodal codec gates).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import tempfile

_CACHE_DIR = "/tmp/mrjob_spark_jars"


def have_jdk() -> bool:
    return bool(shutil.which("javac") and shutil.which("jar"))


def compile_jar(java_source: str, class_name: str) -> str:
    """Compile a single-class Java source into a jar; returns the jar path.
    Cached under ``/tmp`` keyed by source hash, so repeated queries and
    tests pay javac exactly once."""
    if not have_jdk():
        raise RuntimeError(
            "compile_jar requires a JDK (javac + jar on PATH); only a JRE "
            "is available — X7 jar steps themselves run fine with a "
            "prebuilt jar, this helper just builds the demo one"
        )
    digest = hashlib.md5(java_source.encode("utf-8")).hexdigest()[:16]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jar_path = os.path.join(_CACHE_DIR, f"{class_name}-{digest}.jar")
    if os.path.exists(jar_path):
        return jar_path
    build = tempfile.mkdtemp(prefix="mrjob_spark_javac_")
    src = os.path.join(build, f"{class_name}.java")
    with open(src, "w") as f:
        f.write(java_source)
    classes = os.path.join(build, "classes")
    os.makedirs(classes)
    subprocess.run(
        ["javac", "-d", classes, src], check=True, capture_output=True
    )
    tmp_jar = os.path.join(build, "out.jar")
    subprocess.run(
        ["jar", "cf", tmp_jar, "-C", classes, "."],
        check=True,
        capture_output=True,
    )
    os.replace(tmp_jar, jar_path)  # atomic publish into the cache
    return jar_path


#: Demo jar for the X7 probe: read every line under the INPUT path(s)
#: (comma-separated files or directories, ``_``/``.`` files skipped per
#: the Hadoop convention), uppercase it, write to OUTPUT/part-00000.
#: Deliberately a plain-files program — the point of a jar step is
#: arbitrary JVM code that knows nothing about this engine.
UPPERCASE_LINES_JAVA = """
import java.io.*;
import java.nio.file.*;
import java.util.*;

public class UpperCaseLines {
    public static void main(String[] args) throws IOException {
        Path out = Paths.get(args[1]);
        Files.createDirectories(out);
        List<Path> files = new ArrayList<>();
        for (String part : args[0].split(",")) {
            Path in = Paths.get(part);
            if (Files.isDirectory(in)) {
                try (DirectoryStream<Path> ds = Files.newDirectoryStream(in)) {
                    for (Path p : ds) {
                        String n = p.getFileName().toString();
                        if (!n.startsWith("_") && !n.startsWith(".")
                                && Files.isRegularFile(p)) {
                            files.add(p);
                        }
                    }
                }
            } else {
                files.add(in);
            }
        }
        Collections.sort(files);
        try (BufferedWriter w =
                Files.newBufferedWriter(out.resolve("part-00000"))) {
            for (Path f : files) {
                try (BufferedReader r = Files.newBufferedReader(f)) {
                    String line;
                    while ((line = r.readLine()) != null) {
                        w.write(line.toUpperCase(Locale.ROOT));
                        w.newLine();
                    }
                }
            }
        }
    }
}
"""
