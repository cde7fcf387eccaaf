"""An executing mock ``ssh`` (and ``ssh-add``) binary.

    python -m mrjob_spark.testing.mockssh [ssh options] hadoop@HOST CMD...
    python -m mrjob_spark.testing.mockssh add -t 60 KEYFILE

Environment contract (the reference mocks ssh with a fake binary the
same way, ``tests/mockssh.py``; this one EXECUTES the remote command
instead of replaying canned responses):

- ``MOCK_SSH_ROOT`` (required): directory with one subdirectory per
  reachable host; ``hadoop@master.j-X.mock`` resolves to
  ``$MOCK_SSH_ROOT/master.j-X.mock`` and that subdirectory stands in
  for the node's filesystem root. A host with no subdirectory is
  unresolvable → exit 255 with the real client's stderr shape.
- ``MOCK_SSH_CMD_LOG``: append one JSON line per invocation —
  ``{"host": ..., "cmd": [...], "sudo": bool, "identity": path}`` —
  for command-construction assertions.
- ``MOCK_SSH_REFUSE_CHAIN``: if set, a hop with no ``-i`` identity (the
  agent-forwarded second hop of ``master!worker``) fails with
  "Permission denied (publickey)" unless ``ssh-add`` stored a key in
  the on-disk agent file first — pinning that the fs layer really runs
  ``ssh-add`` before chained calls, the way ``-A`` only helps once the
  local agent actually holds the key.

Command execution: the remote command runs as a REAL subprocess with
the node directory as cwd. Absolute-path operands of the file commands
the SSH filesystem issues (``find``, ``cat``, ``ls``, ``tail``,
``test``…) are translated into the node root, so ``cat
/mnt/var/log/...`` reads ``<node>/mnt/var/log/...`` — and ``find``
output is translated BACK, so callers see the remote paths a real node
would print. A leading ``sudo`` is consumed (and logged): the mock
node's files are all readable, sudo only matters for arg rendering.

Chained hosts need no special casing: the reference renders
``master!worker`` as ``ssh … hadoop@master ssh … hadoop@worker CMD``,
so the "remote command" on the master is another ssh argv — a
non-file command that runs untouched and re-enters this module,
landing on the worker's node dir.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

#: ssh options that consume a value argument
_OPTS_WITH_VALUE = {"-i", "-o", "-l", "-p", "-F", "-L", "-R", "-b", "-E"}

#: commands whose absolute-path operands live on the remote node
_FILE_CMDS = {"find", "cat", "ls", "tail", "head", "test", "stat", "du"}


def _agent_file() -> str:
    return os.path.join(os.environ.get("MOCK_SSH_ROOT", "."), ".agent-keys")


def _log_call(entry: dict) -> None:
    path = os.environ.get("MOCK_SSH_CMD_LOG")
    if not path:
        return
    with open(path, "a") as fh:
        fh.write(json.dumps(entry) + "\n")


def _ssh_add_main(args: list) -> int:
    """``ssh-add [-t N] KEYFILE`` — record the key in the on-disk
    'agent' so later (possibly sibling-process) hops can see it, the
    way a real agent outlives individual ssh invocations."""
    keyfile = None
    i = 0
    while i < len(args):
        if args[i] == "-t":
            i += 2
            continue
        keyfile = args[i]
        i += 1
    if not keyfile or not os.path.exists(keyfile):
        sys.stderr.write("%s: No such file or directory\n" % keyfile)
        return 1
    with open(_agent_file(), "a") as fh:
        fh.write(keyfile + "\n")
    _log_call({"ssh_add": keyfile})
    return 0


def _translate(arg: str, node_root: str) -> str:
    if arg.startswith("/") and arg != "/dev/null":
        return node_root + arg
    return arg


def ssh_main(args: list) -> int:
    root = os.environ.get("MOCK_SSH_ROOT")
    if not root:
        sys.stderr.write("mockssh: MOCK_SSH_ROOT not set\n")
        return 255

    # -- parse [options] user@host cmd... ---------------------------------
    identity = None
    target = None
    i = 0
    while i < len(args):
        a = args[i]
        if a == "-i":
            identity = args[i + 1] if i + 1 < len(args) else None
            i += 2
        elif a in _OPTS_WITH_VALUE:
            i += 2
        elif a.startswith("-"):
            i += 1
        else:
            target = a
            i += 1
            break
    cmd = list(args[i:])
    if target is None:
        sys.stderr.write("usage: ssh [options] [user@]host command\n")
        return 255
    user, _, host = target.rpartition("@")

    # agent-forwarding discipline: a hop with no -i needs the agent to
    # hold a key, i.e. the caller must have run ssh-add first
    if (identity is None and os.environ.get("MOCK_SSH_REFUSE_CHAIN")
            and not os.path.exists(_agent_file())):
        sys.stderr.write(
            "%s@%s: Permission denied (publickey).\n" % (user or "?", host)
        )
        return 255

    node_root = os.path.join(root, host)
    if not os.path.isdir(node_root):
        sys.stderr.write(
            "ssh: Could not resolve hostname %s: Name or service not"
            " known\n" % host
        )
        return 255

    sudo = bool(cmd) and cmd[0] == "sudo"
    if sudo:
        cmd = cmd[1:]
    if not cmd:
        sys.stderr.write("mockssh: interactive sessions unsupported\n")
        return 255

    _log_call(
        {"host": host, "user": user, "cmd": cmd, "sudo": sudo,
         "identity": identity}
    )

    base = os.path.basename(cmd[0])
    if base not in _FILE_CMDS:
        # arbitrary command (mrjob boss) or a nested ssh argv: run as-is
        # from the node root; a nested argv re-enters this module
        try:
            return subprocess.run(cmd, cwd=node_root).returncode
        except FileNotFoundError:
            sys.stderr.write("bash: %s: command not found\n" % cmd[0])
            return 127

    run_cmd = [cmd[0]] + [_translate(a, node_root) for a in cmd[1:]]
    try:
        proc = subprocess.run(run_cmd, cwd=node_root, capture_output=True)
    except FileNotFoundError:
        sys.stderr.write("bash: %s: command not found\n" % cmd[0])
        return 127

    stdout = proc.stdout
    if base == "find":
        # the node prints node-rooted paths; a real remote find prints
        # remote paths — strip the root prefix line by line
        prefix = node_root.encode()
        stdout = b"".join(
            (line[len(prefix):] if line.startswith(prefix) else line)
            + b"\n"
            for line in stdout.splitlines()
        )
    # error text from the node leaks local roots too (e.g. find's
    # "no such file" naming the translated path); scrub for realism
    stderr = proc.stderr.replace(node_root.encode(), b"")
    sys.stdout.buffer.write(stdout)
    sys.stdout.buffer.flush()
    sys.stderr.buffer.write(stderr)
    sys.stderr.buffer.flush()
    return proc.returncode


def main(argv: list | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    if args and args[0] == "add":
        return _ssh_add_main(args[1:])
    return ssh_main(args)


if __name__ == "__main__":
    sys.exit(main())
