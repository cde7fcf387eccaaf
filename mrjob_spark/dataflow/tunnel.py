"""SSH tunnel lifecycle for the cloud runners' web UIs.

The reference opens an ssh port-forward to the job tracker / resource
manager whenever it polls a cloud cluster (``mrjob/cloud.py:404-505``):
deterministic bind-port candidates seeded on the cluster id (so a retry
of the same cluster reuses the same local port, reference issue #67 /
``_pick_ssh_bind_ports`` at ``mrjob/cloud.py:535-549``), a launch-poll
loop that walks the candidate ports until one ssh process SURVIVES the
grace period (a dead process means the local bind failed — try the next
port), a give-up latch when the ssh binary itself is missing (no point
retrying an OSError(ENOENT) every poll), restart-on-death on later
calls, and SIGKILL cleanup.

This module is the runner-agnostic core: the runner supplies
``render_args(bind_port) -> argv | None`` (EMR:
``EMRRunner.ssh_tunnel_args``; Dataproc builds gcloud-style args) and a
``tunnel_config`` naming the web UI. Everything here is executable
without a real cluster — the tests drive it with stub "ssh" argvs that
sleep (an open tunnel), exit (a failed bind), or don't exist (no ssh
binary), exactly how the reference's own tunnel tests fake ssh.
"""

from __future__ import annotations

import logging
import os
import random
import signal
import socket
import time
from subprocess import PIPE, Popen
from typing import Callable, Optional, Sequence

log = logging.getLogger(__name__)

#: the reference's default --ssh-bind-ports range
#: (``mrjob/options.py:1305-1313``: "Defaults to 40001:40840")
DEFAULT_SSH_BIND_PORTS = range(40001, 40841)

#: at most this many candidate ports per set_up call
#: (``mrjob/cloud.py:40`` ``_MAX_SSH_RETRIES``)
MAX_SSH_RETRIES = 20


class SSHTunnel:
    """One tunnel to one cluster's web UI.

    ``render_args(bind_port)`` returns the argv that forwards
    ``localhost:bind_port`` (or ``None`` when a tunnel is impossible
    right now — missing key pair, master not yet addressable); this
    class owns the process lifecycle around it.
    """

    def __init__(
        self,
        render_args: Callable[[int], Optional[list]],
        cluster_id: str,
        name: str = "resource manager",
        path: str = "/cluster",
        bind_ports: Sequence[int] = DEFAULT_SSH_BIND_PORTS,
        open_tunnel: bool = False,
        launch_wait_secs: float = 1.0,
        stdin_payload: Optional[bytes] = None,
    ):
        self._render_args = render_args
        self._cluster_id = cluster_id
        self._name = name
        self._path = path
        self._bind_ports = bind_ports
        self._open_tunnel = open_tunnel
        self._launch_wait_secs = launch_wait_secs
        #: written to the tunnel process's stdin right after launch.
        #: The Dataproc runner feeds ``b"\n\n"`` — an empty passphrase
        #: twice — because a first-ever ``gcloud compute ssh`` generates
        #: an SSH key and prompts for one; with stdin=PIPE and nothing
        #: written it would block at the prompt, survive the grace
        #: period, and report an "up" tunnel that forwards nothing
        #: (reference ``mrjob/dataproc.py:1273-1279 _launch_ssh_proc``).
        self._stdin_payload = stdin_payload

        self._proc: Optional[Popen] = None
        self._give_up = False
        self.url: Optional[str] = None

    # -- port selection ---------------------------------------------------

    def pick_bind_ports(self) -> list:
        """Candidate local ports, deterministic per cluster: seed the
        stdlib RNG on the cluster id, sample, and RESTORE the global RNG
        state so tunnel setup never perturbs anyone else's random stream
        (the reference's exact discipline, ``mrjob/cloud.py:535-549``)."""
        state = random.getstate()
        try:
            random.seed(self._cluster_id)
            n = min(MAX_SSH_RETRIES, len(self._bind_ports))
            return random.sample(list(self._bind_ports), n)
        finally:
            random.setstate(state)

    # -- lifecycle ----------------------------------------------------------

    def set_up(self) -> bool:
        """Idempotent: launch the tunnel if not already running. Returns
        True when a tunnel process is up. Mirrors ``_set_up_ssh_tunnel``
        (``mrjob/cloud.py:404-484``): skip when given up; restart when a
        previous process died; walk candidate ports until one launch
        survives the grace period; latch give-up only on OSError from
        Popen (ssh binary missing/not executable — the one failure that
        cannot improve on retry)."""
        if self._give_up:
            return False

        if self._proc is not None:
            self._proc.poll()
            if self._proc.returncode is None:
                return True  # still running
            log.warning(
                "ssh tunnel process exited with return code %d, restarting"
                % self._proc.returncode
            )
            # the dead process's PIPE handles would otherwise leak three
            # fds per restart cycle on a long-polling runner
            self._close_pipes(self._proc)
            self._proc = None

        popen_exception = None
        bound_port = None
        for bind_port in self.pick_bind_ports():
            args = self._render_args(bind_port)
            if not args:
                return False  # can't tunnel right now (not an error latch)
            try:
                proc = Popen(args, stdin=PIPE, stdout=PIPE, stderr=PIPE)
            except OSError as ex:
                popen_exception = ex
                break
            if self._stdin_payload:
                try:
                    proc.stdin.write(self._stdin_payload)
                    proc.stdin.flush()
                except OSError:
                    pass  # died before reading; the poll below catches it
            time.sleep(self._launch_wait_secs)
            proc.poll()
            if proc.returncode is None:
                self._proc = proc
                bound_port = bind_port
                break
            # bind failed (port in use, forward refused): next port
            self._close_pipes(proc)

        if self._proc is not None:
            bind_host = socket.getfqdn() if self._open_tunnel else "localhost"
            self.url = "http://%s:%d%s" % (bind_host, bound_port, self._path)
            log.info("Connect to %s at: %s" % (self._name, self.url))
            return True

        if popen_exception is not None:
            log.warning("Couldn't open SSH tunnel: %s" % popen_exception)
            self._give_up = True
        else:
            log.warning("Failed to open ssh tunnel to %s" % self._name)
        return False

    @property
    def gave_up(self) -> bool:
        return self._give_up

    @staticmethod
    def _close_pipes(proc: Popen) -> None:
        for f in (proc.stdin, proc.stdout, proc.stderr):
            if f is not None and not f.closed:
                try:
                    f.close()
                except OSError:
                    pass  # a half-broken pipe still drops its fd

    def kill(self) -> None:
        """SIGKILL the tunnel if it is running (``mrjob/cloud.py:486-505``;
        ssh holds the forward open, so a polite terminate just delays).
        Pipes are closed whether the process is running or already
        self-exited — the dead branch leaked three fds otherwise."""
        if self._proc is None:
            return
        self._proc.poll()
        self._close_pipes(self._proc)
        if self._proc.returncode is None:
            log.info("Killing our SSH tunnel (pid %d)" % self._proc.pid)
            try:
                os.kill(self._proc.pid, signal.SIGKILL)
                self._proc.wait()
            except Exception as ex:  # already gone
                log.info("Unable to kill ssh tunnel (pid %d): %s" % (
                    self._proc.pid, ex))
        self._proc = None
        self.url = None
