"""Thread shell: monitors (mailboxes), performance monitor, orchestration."""
